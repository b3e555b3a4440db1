from myosuite_tpu.renderer.renderer import Renderer, render_rollout

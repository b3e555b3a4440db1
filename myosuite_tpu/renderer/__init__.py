from myosuite_tpu.renderer.renderer import (Renderer, render_qpos_sequence,
                                            render_rollout)

from myosuite_tpu.renderer.renderer import (PassiveViewer, Renderer,
                                            render_qpos_sequence,
                                            render_rollout)

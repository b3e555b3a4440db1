from myosuite_tpu.robot.robot import (Robot, SensorCache, SensorSpec,
                                      sensor2sim)

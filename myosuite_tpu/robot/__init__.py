from myosuite_tpu.robot.robot import Robot, SensorSpec

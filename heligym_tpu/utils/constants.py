"""Shared physical/unit constants.

Values mirror the reference simulation constants
(/root/reference/heligym/envs/dynamics/helicopter_dynamics.py:14-19 and
/root/reference/heligym/envs/helicopter.py:18-26) so that the TPU build is
numerically interchangeable with the reference CPU implementation.
"""
import math

FTS2KNOT = 0.5924838        # ft/s -> knots
EPS = 1e-4                  # small value guarding division by zero (dynamics)
ENV_EPS = 1e-10             # env-layer epsilon (helicopter.py:21)
R2D = 180.0 / math.pi       # rad -> deg
D2R = 1.0 / R2D             # deg -> rad
FT2MTR = 0.3048             # ft -> m
SQRT_3 = 1.7320508075688772
TWO_D_PI = 0.6366197723675814  # 2/pi

FPS = 50.0                  # simulation tick rate [Hz]
DT = 1.0 / FPS              # simulation step [s]

# RK4 combination constant, written exactly as the reference does
# (dynamics.py:168) so float32 arithmetic matches bit-for-bit.
RK4_SIXTH = 0.16666666666666666

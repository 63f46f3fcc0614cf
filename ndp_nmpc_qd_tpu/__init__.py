"""TPU-native nonlinear MPC framework for quadrotor swarms with neural
downwash prediction — a from-scratch JAX/XLA redesign of the capabilities of
Li-Jinjie/ndp_nmpc_qd (CDC 2023, arXiv 2304.07794).

Layer map (bottom-up; see SURVEY.md for the reference correspondence):

  ops/         quaternion algebra, ERK integrators
  models/      10-state body-rate dynamics, downwash MLP
  solver/      OCP linearization, Riccati-IPM QP, SQP-RTI controller
  traj/        min-snap fitting, piecewise evaluation, differential flatness,
               NMPC reference generation
  estimators/  hover-throttle KF, small filters
  sim/         in-graph plant (dop_sim role), closed-loop swarm episodes
  swarm/       formation offsets / leader-follower semantics
  parallel/    mesh sharding for multi-chip scale-out
  params.py    typed config tree (reference params modules)
  cli.py       mission runner (launch-file topologies)
"""

from . import params  # noqa: F401

__version__ = "0.1.0"

"""ffmpc_tpu — TPU-native Franka force-feedback MPC / trajectory-optimization engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
omar-a-aman/Franka-Force-Feedback-MPC (reference mounted at /root/reference):

- ``core``     batched Panda rigid-body kernels (FK / RNEA / mass matrix /
               free + contact forward dynamics) — the Pinocchio equivalent
               (reference: crocoddyl_classical.py:137-258 uses pinocchio).
- ``ocp``      residuals, activations, cost stacks and discrete action models
               (classical (q,v)/tau and augmented (q,v,tau_hat)/w) — the
               Crocoddyl model-side equivalent.
- ``solver``   functional FDDP / BoxFDDP with Riccati sweep, vmap-batched —
               the Crocoddyl SolverBoxFDDP equivalent.
- ``sim``      host MuJoCo arbiter plant + batched on-device JAX plant —
               the FrankaMujocoSim equivalent (reference: src/sim/franka_sim.py).
- ``mpc``      classical + force-feedback MPC controllers.
- ``tasks``    trajectory generators.
- ``run``      scenarios, uncertainty injection, experiment runners, CLI.
- ``parallel`` device mesh / shard_map scale-out for batched solves.
- ``utils``    run logging and evaluation plots.
"""

__version__ = "0.1.0"

"""nvfi_tpu — a TPU-native neural velocity-field simulation framework.

Re-implements the full capability surface of NVFi (NeurIPS'23, "Neural
Velocity Fields for 3D Physics Learning from Dynamic Videos";
reference: /root/reference) as an idiomatic JAX/XLA/Pallas framework:

* K-plane keyframe radiance fields with learned velocity advection
  (reference models/tensorf_keyframe.py),
* static TensoRF VM / CP fields (reference models/tensorf_base.py),
* physics PDE regularization (divergence-free + transport,
  reference models/nvfi.py:42-84),
* unsupervised 3D instance segmentation (reference train_segm.py),
* dynamic motion transfer (reference test_transfer_vel.py),
* full train / eval / benchmark drivers.

Design stance (see SURVEY.md §7): pure-functional pytree scene state,
static shapes under jit, masked compute instead of boolean-shape
compaction, Pallas kernels for the hot gather/composite ops, and
`jax.sharding`-based data parallelism over TPU meshes.
"""

__version__ = "0.1.0"

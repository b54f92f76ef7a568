"""gfla_tpu — a TPU-native JAX/Pallas rebuild of Global-Flow-Local-Attention.

A GAN framework for deep image spatial transformation (pose-guided person
image generation, person/face animation, novel view synthesis), re-designed
TPU-first: NHWC layouts, XLA-fusable functional ops, pjit data parallelism
over a jax.sharding.Mesh, and Pallas kernels for the local-attention hot path.

Reference capability surface: RenYurui/Global-Flow-Local-Attention
(CVPR 2020, arXiv:2003.00696). This is a from-scratch re-design, not a port.
"""

__version__ = "0.1.0"

"""wrenc-tpu: a TPU-native H.266/VVC all-intra encoder framework.

Capability parity target: hjmkt/wrenc (see SURVEY.md). Architecture is
TPU-first (JAX/XLA/Pallas/pjit for the compute path, batched wavefront RD
search, per-CTU-row wavefront CABAC) rather than a port.
"""

__version__ = "0.1.0"

"""jxl_tpu — a TPU-native JPEG XL decode engine.

Built from scratch for JAX/XLA/Pallas. Host side (Python/C++) handles
bitstream parsing, headers, and entropy table setup; the device side
(JAX + Pallas) handles the pixel math: inverse transforms, dequant,
chroma-from-luma, restoration filters, upsampling and color conversion,
sharded group-parallel over a TPU mesh with halo collectives.

Capability reference: libjxl/jxl-rs (see SURVEY.md). This is not a port:
the architecture is host-planner + pure device programs per frame shape.
"""

__version__ = "0.1.0"

GROUP_DIM = 256        # pixels per (HF) group side; ref: jxl/src/lib.rs:24
LF_GROUP_DIM = 2048    # pixels per LF group side (GROUP_DIM * 8)
BLOCK_DIM = 8

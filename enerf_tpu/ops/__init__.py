"""TPU-native compute ops (the role of the reference's CUDA extensions).

Reference parity map (reference file -> this package):
  gridencoder/src/gridencoder.cu  -> ops/hashgrid.py  (gather + scatter-add AD)
  shencoder/src/shencoder.cu      -> ops/sh.py        (closed-form polynomials)
  raymarching/src/raymarching.cu  -> ops/aabb.py, ops/composite.py,
                                     ops/morton.py, render/march.py
  activation.py (trunc_exp)       -> ops/trunc_exp.py
"""

from enerf_tpu.ops.trunc_exp import trunc_exp
from enerf_tpu.ops.sh import sh_encode
from enerf_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_table
from enerf_tpu.ops.aabb import near_far_from_aabb, polar_from_ray
from enerf_tpu.ops.composite import composite_rays, composite_weights
from enerf_tpu.ops.freq import freq_encode
from enerf_tpu.ops.morton import morton3d, morton3d_invert, packbits

"""The instant-ngp field: hash encoder + sigma MLP + SH/dir + color MLP.

Parity: reference nerf/network.py (NeRFNetwork) —
  - sigma net: hash encoding (16 levels x 2, desired_resolution=2048*bound)
    -> `num_layers` (2) bias-free Linears, width 64, ReLU between; output
    1 + geo_feat_dim (15); density = trunc_exp(out[..., 0]).
  - color net: SH(dir, degree 4) (optionally zeroed by
    disable_view_direction, network.py:122) concat geo_feat ->
    `num_layers_color` (3) bias-free Linears width 64 -> sigmoid, out_dim
    in {1, 3}.
  - background net (bg_radius > 0): 2D hash encoding (4 levels,
    desired_resolution=2048) of sphere polar coords concat SH(dir) ->
    2-layer MLP -> sigmoid (network.py:79-101, 153-168).

TPU design: a pure-functional module — parameters are a flat dict pytree;
all apply functions are jit-friendly and batched over [N, .].  Matmuls are
issued at the caller-chosen compute dtype (bf16 on TPU) with fp32
accumulation via preferred_element_type; density activation stays fp32.
No nn.Module state: `FieldStatic` carries only static hyperparameters and
hash-grid metadata (hashable, usable as a jit static argument).
"""

import math

import jax
import jax.numpy as jnp

from enerf_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_table
from enerf_tpu.ops.blockgrid import BlockGridMeta, block_encode, init_block_table
from enerf_tpu.ops.freq import freq_encode, freq_output_dim
from enerf_tpu.ops.sh import sh_encode, sh_output_dim
from enerf_tpu.ops.trunc_exp import trunc_exp


class FieldStatic:
    """Static field hyperparameters (jit-static, hashed by value so
    identical configurations share jit caches across instances)."""

    def _key(self):
        return (
            self.bound, self.num_layers, self.hidden_dim, self.geo_feat_dim,
            self.num_layers_color, self.hidden_dim_color, self.sh_degree,
            self.out_dim_color, self.disable_view_direction, self.bg_radius,
            self.num_layers_bg, self.hidden_dim_bg, str(self.compute_dtype),
            self.encoding, self.grid_meta, self.use_fused_head,
            self.fast_table_grad, self.grid_block, self.bf16_gather,
            self.density_bias, self.segsum_table_grad, self.position_grads,
            self.mxu_encode, self.mxu_rows, self.coalesce_rounds,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and self._key() == other._key()

    def __init__(
        self,
        bound=1.0,
        num_layers=2,
        hidden_dim=64,
        geo_feat_dim=15,
        num_layers_color=3,
        hidden_dim_color=64,
        sh_degree=4,
        out_dim_color=3,
        disable_view_direction=False,
        bg_radius=-1.0,
        num_layers_bg=2,
        hidden_dim_bg=64,
        num_levels=16,
        level_dim=2,
        base_resolution=16,
        log2_hashmap_size=19,
        gridtype="hash",
        grid_block=4,         # blockgrid row geometry (4: 1KB rows, 3: 512B)
        encoding="hashgrid",  # 'hashgrid' (exact reference parity) or
                              # 'blockgrid' (TPU-fast block-packed rows)
        use_fused_head=False,  # Pallas fused sigma+color head (--ff role)
        fast_table_grad=False,  # Pallas VMEM-accum table backward
                               # (blockgrid only; zero position grads — see
                               # ops/scatter_accum.block_encode_fast).
                               # Default off until TPU-validated; bench.py
                               # enables it explicitly.
        bf16_gather=None,      # gather table rows in bf16
                               # (ops/blockgrid.block_encode_bf16).
                               # MEASURED SLOWER on v5e (148.9k vs 158.9k
                               # rays/s, r2d sweep): the gather is address-
                               # rate bound even at 1 KB rows, so the bf16
                               # copy's materialization is pure overhead.
                               # None/False: off (default); True: opt in.
        density_bias=0.0,      # added to the density logit before trunc_exp
                               # (opaque-at-init option; see field_density)
        segsum_table_grad=False,  # table backward via sort + prefix-sum
                               # segment reduce + sorted-unique scatter
                               # (ops/blockgrid.block_encode_segsum) instead
                               # of XLA's duplicate-index scatter-add
        mxu_encode=False,      # MXU-routed encode (blockgrid only,
                               # ops/blockgrid.block_encode_mxu): coarse
                               # levels' gather/scatter pair becomes exact
                               # one-hot matmuls; the fine-level backward
                               # scatter stream is run-merged (along-ray
                               # duplicate rows) before the scatter-add.
                               # Zero position grads (rays are data).
        mxu_rows=2048,         # n_rows threshold for the matmul routing
        coalesce_rounds=3,     # pairwise run-merge passes on the fine
                               # scatter stream (0: off)
        position_grads=False,  # with segsum_table_grad: also compute exact
                               # dL/dx (reference dy_dx, gridencoder.cu:176-
                               # 221) — pose-refinement workloads.  The
                               # default fast paths return ZERO position
                               # grads; plain block_encode/hash_encode give
                               # them via autodiff regardless of this flag.
        compute_dtype=jnp.float32,
    ):
        self.use_fused_head = use_fused_head
        self.fast_table_grad = fast_table_grad
        self.segsum_table_grad = bool(segsum_table_grad)
        self.position_grads = bool(position_grads)
        self.bf16_gather = bool(bf16_gather)
        self.mxu_encode = bool(mxu_encode)
        self.mxu_rows = int(mxu_rows)
        self.coalesce_rounds = int(coalesce_rounds)
        self.density_bias = float(density_bias)
        self.bound = float(bound)
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.geo_feat_dim = geo_feat_dim
        self.num_layers_color = num_layers_color
        self.hidden_dim_color = hidden_dim_color
        self.sh_degree = sh_degree
        self.out_dim_color = out_dim_color
        self.disable_view_direction = disable_view_direction
        self.bg_radius = float(bg_radius)
        self.num_layers_bg = num_layers_bg
        self.hidden_dim_bg = hidden_dim_bg
        self.compute_dtype = compute_dtype
        self.encoding = encoding
        self.grid_block = int(grid_block)

        # reference network.py:36: desired_resolution = 2048 * bound
        if encoding in ("frequency", "none"):
            # reference encoding.py:45-76 get_encoder also serves the
            # grid-free encoders (identity / NeRF sinusoidal); no table.
            self.grid_meta = None
            self.in_dim = (freq_output_dim(3, multires=6)
                           if encoding == "frequency" else 3)
            self.in_dim_dir = sh_output_dim(sh_degree)
            if self.bg_radius > 0:
                self.bg_grid_meta = HashGridMeta(
                    input_dim=2, num_levels=4, level_dim=level_dim,
                    base_resolution=base_resolution,
                    log2_hashmap_size=log2_hashmap_size,
                    desired_resolution=2048, gridtype=gridtype,
                )
                self.in_dim_bg = self.bg_grid_meta.output_dim
            else:
                self.bg_grid_meta = None
                self.in_dim_bg = 0
            return
        if encoding == "blockgrid":
            self.grid_meta = BlockGridMeta(
                num_levels=num_levels,
                level_dim=level_dim,
                base_resolution=base_resolution,
                log2_hashmap_size=log2_hashmap_size,
                desired_resolution=2048 * max(self.bound, 1.0),
                block=self.grid_block,
            )
        else:
            self.grid_meta = HashGridMeta(
                input_dim=3,
                num_levels=num_levels,
                level_dim=level_dim,
                base_resolution=base_resolution,
                log2_hashmap_size=log2_hashmap_size,
                desired_resolution=2048 * max(self.bound, 1.0),
                gridtype=gridtype,
            )
        self.in_dim = self.grid_meta.output_dim
        self.in_dim_dir = sh_output_dim(sh_degree)
        if self.bg_radius > 0:
            # reference network.py:83: much smaller 2D hashgrid
            self.bg_grid_meta = HashGridMeta(
                input_dim=2,
                num_levels=4,
                level_dim=level_dim,
                base_resolution=base_resolution,
                log2_hashmap_size=log2_hashmap_size,
                desired_resolution=2048,
                gridtype=gridtype,
            )
            self.in_dim_bg = self.bg_grid_meta.output_dim
        else:
            self.bg_grid_meta = None
            self.in_dim_bg = 0

    def mlp_dims(self, which):
        """(in, out) per layer for 'sigma' | 'color' | 'bg' nets."""
        if which == "sigma":
            L, hid = self.num_layers, self.hidden_dim
            first, last = self.in_dim, 1 + self.geo_feat_dim
        elif which == "color":
            L, hid = self.num_layers_color, self.hidden_dim_color
            first, last = self.in_dim_dir + self.geo_feat_dim, self.out_dim_color
        elif which == "bg":
            L, hid = self.num_layers_bg, self.hidden_dim_bg
            first, last = self.in_dim_bg + self.in_dim_dir, self.out_dim_color
        else:
            raise ValueError(which)
        dims = []
        for l in range(L):
            i = first if l == 0 else hid
            o = last if l == L - 1 else hid
            dims.append((i, o))
        return dims


def _init_linear(key, in_dim, out_dim, dtype):
    # torch.nn.Linear default (kaiming_uniform a=sqrt(5)) == U(+-1/sqrt(fan_in))
    bnd = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype=dtype, minval=-bnd, maxval=bnd)


def init_field_params(key, static, dtype=jnp.float32):
    """Build the parameter pytree."""
    keys = jax.random.split(key, 16)
    if static.encoding in ("frequency", "none"):
        params = {}
    elif static.encoding == "blockgrid":
        params = {"hash_table": init_block_table(keys[0], static.grid_meta, dtype)}
    else:
        params = {"hash_table": init_hash_table(keys[0], static.grid_meta, dtype)}
    for i, (di, do) in enumerate(static.mlp_dims("sigma")):
        params[f"sigma_w{i}"] = _init_linear(keys[1 + i], di, do, dtype)
    for i, (di, do) in enumerate(static.mlp_dims("color")):
        params[f"color_w{i}"] = _init_linear(keys[5 + i], di, do, dtype)
    if static.bg_radius > 0:
        params["bg_table"] = init_hash_table(keys[9], static.bg_grid_meta, dtype)
        for i, (di, do) in enumerate(static.mlp_dims("bg")):
            params[f"bg_w{i}"] = _init_linear(keys[10 + i], di, do, dtype)
    return params


def _mlp(params, prefix, n_layers, h, compute_dtype):
    h = h.astype(compute_dtype)
    for l in range(n_layers):
        w = params[f"{prefix}_w{l}"].astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        if l != n_layers - 1:
            h = jnp.maximum(h, 0.0).astype(compute_dtype)
    return h  # fp32 (from last matmul accumulation)


def _dir_encode(static, d):
    enc = sh_encode(d, static.sh_degree)
    if static.disable_view_direction:  # reference network.py:122: `* 0`
        enc = enc * 0.0
    return enc


def _encode(params, static, x01):
    if static.encoding == "none":
        return x01
    if static.encoding == "frequency":
        return freq_encode(x01, multires=6)
    table = params["hash_table"]
    if static.encoding == "blockgrid":
        if static.segsum_table_grad:
            from enerf_tpu.ops.blockgrid import block_encode_segsum
            return block_encode_segsum(x01, table, static.grid_meta,
                                       static.position_grads)
        if static.mxu_encode:
            from enerf_tpu.ops.blockgrid import block_encode_mxu
            return block_encode_mxu(x01, table, static.grid_meta,
                                    static.mxu_rows, static.coalesce_rounds)
        if static.fast_table_grad:
            from enerf_tpu.ops.scatter_accum import block_encode_fast
            return block_encode_fast(x01, table, static.grid_meta)
        if static.bf16_gather:
            from enerf_tpu.ops.blockgrid import block_encode_bf16
            return block_encode_bf16(x01, table, static.grid_meta)
        return block_encode(x01, table, static.grid_meta)
    return hash_encode(x01, table, static.grid_meta)


def field_density(params, static, x):
    """x: [N, 3] in [-bound, bound] -> (sigma [N], geo_feat [N, G])."""
    x01 = (x + static.bound) / (2.0 * static.bound)
    # table stays f32 end to end by default: the gather is address-rate
    # bound (bf16 rows measured SLOWER once the cast overhead is counted,
    # BENCH_NOTES.md r2d) and the backward scatter-add accumulates in f32
    enc = _encode(params, static, x01)
    # names the encode output for jax.checkpoint save_only_these_names
    # policies (train/step.py remat_fixed=2: backward keeps this ~[N, L*C]
    # activation instead of re-running the address-bound gathers)
    from jax.ad_checkpoint import checkpoint_name
    enc = checkpoint_name(enc, "encode_out")
    h = _mlp(params, "sigma", static.num_layers, enc, static.compute_dtype)
    # density_bias shifts the logit so the INITIAL field can be opaque
    # (sigma0 ~ e^bias).  The reference's enerf configs get an opaque start
    # for free from 512 uniform samples over a bound-3 box (tau ~ 5 at
    # sigma ~ 1, renderer.py run()); the sparse march (~32 samples, dt
    # 2sqrt(3)/1024, tau ~ 0.1*sigma) starts transparent instead, which
    # enables the mist gauge mode (ROUND2_STATUS.md).  Pure
    # reparametrization: the MLP can cancel it, so expressivity is
    # unchanged — only the optimization trajectory shifts to carving.
    sigma = trunc_exp(h[..., 0].astype(jnp.float32) + static.density_bias)
    geo_feat = h[..., 1:]
    return sigma, geo_feat


def field_color(params, static, d, geo_feat):
    """d: [N, 3] unit dirs, geo_feat: [N, G] -> rgb [N, out_dim_color]."""
    enc = _dir_encode(static, d)
    h = jnp.concatenate(
        [enc.astype(static.compute_dtype), geo_feat.astype(static.compute_dtype)], axis=-1
    )
    h = _mlp(params, "color", static.num_layers_color, h, static.compute_dtype)
    return jax.nn.sigmoid(h.astype(jnp.float32))


def field_forward(params, static, x, d):
    """(sigma [N], color [N, C]) — reference network.py:104-132."""
    sigma, geo_feat = field_density(params, static, x)
    color = field_color(params, static, d, geo_feat)
    return sigma, color


def field_forward_fused(params, static, x, d):
    """Fused-MLP head variant (the reference's --ff backbone,
    network_ff.py): hash encoding feeds one Pallas kernel computing the
    whole sigma+color head.  Requires the default 2/3-layer topology."""
    from enerf_tpu.ops.fused_mlp import fused_field_head

    assert static.num_layers == 2 and static.num_layers_color == 3, (
        "fused head supports the reference topology (2 sigma / 3 color layers)"
    )
    x01 = (x + static.bound) / (2.0 * static.bound)
    cd = static.compute_dtype
    enc = _encode(params, static, x01)
    denc = _dir_encode(static, d)
    sigma, rgb = fused_field_head(
        enc.astype(cd), denc.astype(cd),
        params["sigma_w0"].astype(cd), params["sigma_w1"].astype(cd),
        params["color_w0"].astype(cd), params["color_w1"].astype(cd),
        params["color_w2"].astype(cd),
    )
    if static.density_bias:
        # exp(raw + b) == exp(raw) * e^b — bias applied outside the kernel
        sigma = sigma * math.exp(static.density_bias)
    return sigma, rgb


def field_background(params, static, polar, d):
    """polar: [N, 2] in [-1, 1]; d: [N, 3] -> rgb [N, C]."""
    x01 = (polar + 1.0) / 2.0
    enc = hash_encode(x01, params["bg_table"], static.bg_grid_meta)
    denc = _dir_encode(static, d)
    h = jnp.concatenate(
        [denc.astype(static.compute_dtype), enc.astype(static.compute_dtype)], axis=-1
    )
    h = _mlp(params, "bg", static.num_layers_bg, h, static.compute_dtype)
    return jax.nn.sigmoid(h.astype(jnp.float32))

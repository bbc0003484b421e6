import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.utils.profiling import time_batched_inference

B, H, W = 512, 480, 640
WH, WW = 304, 512
rng = np.random.default_rng(0)
dpt = jnp.asarray(rng.random((B, H, W)).astype(np.float32) * 1000)
wy = jnp.zeros((B, 2), jnp.float32)  # scalar-prefetch: window offsets (0,0)
np.asarray(dpt[0,0,:1])

# 1) band DMA + trivial body (copy a corner): orchestration+DMA cost only
def trivial(params_ref, dpt_ref, out_ref):
    out_ref[:, :] = dpt_ref[0:128, 0:128]

def run_trivial(d, prm):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(WH), pl.Element(WW)),
            lambda i, p: (i, pl.multiple_of(p[i, 0].astype(jnp.int32), 8),
                          pl.multiple_of(p[i, 1].astype(jnp.int32), 128)))],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, p: (i, 0, 0)))
    def k(p, d_, o_):
        trivial(p, d_, o_.at[0])
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B,128,128), jnp.float32),
                          grid_spec=gs)(prm, d)

ms = time_batched_inference(jax.jit(run_trivial), (dpt, wy), iters=40)
print(f"band DMA + trivial body: {ms:.3f} ms = {ms*1000/B:.2f} us/sample", flush=True)

# 2) same but with the two selection matmuls (fixed one-hot), no epilogue
sel_r = jnp.zeros((128, WH), jnp.float32).at[:, :128].set(jnp.eye(128))
sel_c = jnp.zeros((128, WW), jnp.float32).at[:, :128].set(jnp.eye(128))

def run_mm(d, prm):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(WH), pl.Element(WW)),
            lambda i, p: (i, pl.multiple_of(p[i, 0].astype(jnp.int32), 8),
                          pl.multiple_of(p[i, 1].astype(jnp.int32), 128)))],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, p: (i, 0, 0)))
    def k(p, d_, o_):
        hh = jax.lax.broadcasted_iota(jnp.int32, (128, WH), 1).astype(jnp.float32)
        ww_ = jax.lax.broadcasted_iota(jnp.int32, (128, WW), 1).astype(jnp.float32)
        rs = (hh == 64.0).astype(jnp.float32)
        cs = (ww_ == 32.0).astype(jnp.float32)
        rows = jnp.dot(rs, d_[:, :], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        o_[0] = jax.lax.dot_general(rows, cs, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B,128,128), jnp.float32),
                          grid_spec=gs)(prm, d)

ms = time_batched_inference(jax.jit(run_mm), (dpt, wy), iters=40)
print(f"band DMA + 2 HIGHEST matmuls: {ms:.3f} ms = {ms*1000/B:.2f} us/sample", flush=True)

# 3) matmuls at DEFAULT precision (1-pass): how much is bf16x3?
def run_mm_def(d, prm):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(B,),
        in_specs=[pl.BlockSpec(
            (None, pl.Element(WH), pl.Element(WW)),
            lambda i, p: (i, pl.multiple_of(p[i, 0].astype(jnp.int32), 8),
                          pl.multiple_of(p[i, 1].astype(jnp.int32), 128)))],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, p: (i, 0, 0)))
    def k(p, d_, o_):
        hh = jax.lax.broadcasted_iota(jnp.int32, (128, WH), 1).astype(jnp.float32)
        ww_ = jax.lax.broadcasted_iota(jnp.int32, (128, WW), 1).astype(jnp.float32)
        rs = (hh == 64.0).astype(jnp.float32)
        cs = (ww_ == 32.0).astype(jnp.float32)
        rows = jnp.dot(rs, d_[:, :], preferred_element_type=jnp.float32)
        o_[0] = jax.lax.dot_general(rows, cs, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    return pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B,128,128), jnp.float32),
                          grid_spec=gs)(prm, d)

ms = time_batched_inference(jax.jit(run_mm_def), (dpt, wy), iters=40)
print(f"band DMA + 2 DEFAULT matmuls: {ms:.3f} ms = {ms*1000/B:.2f} us/sample", flush=True)

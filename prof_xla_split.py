import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
from deepprior_tpu.ops.exact_mxu import split3_bf16

rng = np.random.default_rng(0)
B, H, W, dh = 8, 480, 640, 128
dpt = jnp.asarray(rng.uniform(400, 1500, (B, H, W)).astype(np.float32))
q = jnp.asarray(rng.integers(0, H, (B, dh)).astype(np.float32))
hh = jnp.arange(H, dtype=jnp.float32)

def ref(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.float32)
    return jnp.einsum("bih,bhw->biw", rowsel, dpt,
                      precision=jax.lax.Precision.HIGHEST)

def split_plain(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.bfloat16)
    return sum(jnp.einsum("bih,bhw->biw", rowsel, d,
                          preferred_element_type=jnp.float32)
               for d in split3_bf16(dpt))

def split_barrier(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.bfloat16)
    parts = jax.lax.optimization_barrier(split3_bf16(dpt))
    return sum(jnp.einsum("bih,bhw->biw", rowsel, d,
                          preferred_element_type=jnp.float32)
               for d in parts)

r = jax.jit(ref)(dpt, q)
p = jax.jit(split_plain)(dpt, q)
b = jax.jit(split_barrier)(dpt, q)
r, p, b = map(np.asarray, (r, p, b))
print("plain  max|diff|:", np.abs(r - p).max(),
      " nmismatch:", (r != p).sum(), flush=True)
print("barrier max|diff|:", np.abs(r - b).max(),
      " nmismatch:", (r != b).sum(), flush=True)

def split_barrier2(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.bfloat16)
    outs = [jax.lax.optimization_barrier(
                jnp.einsum("bih,bhw->biw", rowsel, d,
                           preferred_element_type=jnp.float32))
            for d in split3_bf16(dpt)]
    return (outs[0] + outs[1]) + outs[2]

b2 = np.asarray(jax.jit(split_barrier2)(dpt, q))
print("barrier2 max|diff|:", np.abs(r - b2).max(),
      " nmismatch:", (r != b2).sum(), flush=True)

# is a single-term einsum an exact selection?
def one_term(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.bfloat16)
    a1 = dpt.astype(jnp.bfloat16)
    return jnp.einsum("bih,bhw->biw", rowsel, a1,
                      preferred_element_type=jnp.float32)
def one_term_ref(dpt, q):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.float32)
    a1 = dpt.astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.einsum("bih,bhw->biw", rowsel, a1,
                      precision=jax.lax.Precision.HIGHEST)
t1 = np.asarray(jax.jit(one_term)(dpt, q))
t1r = np.asarray(jax.jit(one_term_ref)(dpt, q))
print("one-term max|diff|:", np.abs(t1r - t1).max(),
      " nmismatch:", (t1r != t1).sum(), flush=True)

# is the split itself exact on device at XLA level?
def recon(x):
    a1, a2, a3 = split3_bf16(x)
    return (a1.astype(jnp.float32) + a2.astype(jnp.float32)) + a3.astype(jnp.float32)
rec = np.asarray(jax.jit(recon)(dpt))
d0 = np.asarray(dpt)
print("split recon max|diff|:", np.abs(rec - d0).max(),
      " nmismatch:", (rec != d0).sum(), flush=True)

# same split computed in numpy, fed to the 3-dot sum with barriers
def split_np(x):
    a1 = x.astype(np.float32).astype(jnp.bfloat16)
    r1 = x - np.asarray(a1, np.float32)
    a2 = r1.astype(jnp.bfloat16)
    r2 = r1 - np.asarray(a2, np.float32)
    a3 = r2.astype(jnp.bfloat16)
    return a1, a2, a3
n1, n2, n3 = split_np(d0)
def dots_only(q, n1, n2, n3):
    rowsel = (q[:, :, None] == hh[None, None, :]).astype(jnp.bfloat16)
    outs = [jax.lax.optimization_barrier(
                jnp.einsum("bih,bhw->biw", rowsel, d,
                           preferred_element_type=jnp.float32))
            for d in (n1, n2, n3)]
    return (outs[0] + outs[1]) + outs[2]
hd = np.asarray(jax.jit(dots_only)(q, jnp.asarray(np.asarray(n1)), jnp.asarray(np.asarray(n2)), jnp.asarray(np.asarray(n3))))
print("np-split dots max|diff|:", np.abs(r - hd).max(),
      " nmismatch:", (r != hd).sum(), flush=True)

"""Pallas TPU kernel: fused FFM field-pair interactions.

Computes the reference's FFM output (reference: src/block_ffm.rs:153-261) —
contra-field accumulation, field-pair dot products with diagonal
self-interaction subtraction, and the lower-triangle (×2 off-diagonal)
flattening (src/block_misc.rs:736-884) — in ONE kernel over batch tiles:

    C[b,t,f,:]  = Σ_{n: field(n)=f} v_n · emb[b,n,t·k:(t+1)·k]
    inter[b,t,f] = 0.5·⟨C[b,t,f,:], C[b,f,t,:]⟩ − [t=f]·0.5·Σ_{n∈t} v²‖w‖²
    out[b, tri(t,f)] = inter · (1 if t==f else 2)

The unfused XLA path (models/model.py ffm_outputs + triangle) materializes
the [B,N,F,k] weighted embeddings and the [B,F,F,k] contra tensor in HBM;
here both intermediates live in VMEM per batch tile, so HBM traffic is just
emb in / triangle out. The contra accumulation and the pair dots are MXU
contractions via one-hot matrices.

**Status: RETIRED as a production path (round 3), with the measurement
that justifies it.** The pair-dot step needs the 128-lane dim regrouped as
(F, k) registers; with FFM's small k (typically 4–16) every formulation
hits a Mosaic limitation — re-checked 2026-08-17 on the current toolchain:

    Mosaic failed to compile TPU kernel: infer-vector-layout:
    unsupported shape cast
    %tpu.reshape : (vector<256x2x16xf32>) -> vector<256x2x2x8xf32>

(the static-slice rewrite equally trips "result/input offset mismatch on
non-concat dimension" for 8-lane unaligned slices). The kernel stays
verified in interpreter mode (bit-equal to the XLA path,
tests/test_pallas_ffm.py) as the fusion blueprint.

**Roofline: why a working kernel would not move the needle.** Measured on
one v5e, k=8, B=32768, best-of-3 after warm-up (scripts in the round-3
log): the ENTIRE FFM forward — row gather + contra einsums + triangle —
costs 3.50 ms against a 17.28 ms full train step at 2^25 (20.3%), and
3.57 ms against 32.96 ms at 2^29 (10.8%); both forward numbers sit just
above this environment's ~3 ms per-dispatch floor, so the pure compute
share is smaller still. A perfect fusion could at best recover a~10-20%
of device-step time on a stage that already runs ≥2× faster than the
pipeline's other serial resources (host ingest, host↔device transfer —
see bench.py's decomposition). Revisit only if Mosaic grows lane-dim
regrouping AND the step becomes the measured bottleneck; k that is a
multiple of 128 (whole-row slabs) would also sidestep the reshape.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tri_index_matrices(F: int):
    """[F*F, T] selection matrix mapping inter[t,f] (row-major) to the
    row-major lower triangle with off-diagonal ×2."""
    T = F * (F + 1) // 2
    sel = np.zeros((F * F, T), np.float32)
    col = 0
    for i in range(F):
        for j in range(i):
            sel[i * F + j, col] = 2.0
            col += 1
        sel[i * F + i, col] = 1.0
        col += 1
    return sel


def _ffm_kernel(vals_ref, fields_ref, emb_ref, tri_sel_ref, out_ref, *, F, k):
    TB, N, Fk = emb_ref.shape
    emb = emb_ref[:]                       # [TB, N, F·k]
    vals = vals_ref[:]                     # [TB, N]
    fields = fields_ref[:]                 # [TB, N] int32 (−1 = padding)

    f_iota = jax.lax.broadcasted_iota(jnp.int32, (TB, N, F), 2)
    onehot = (fields[:, :, None] == f_iota).astype(jnp.float32)  # [TB,N,F]
    oh_v = onehot * vals[:, :, None]

    # contra: C[b,f,e] = Σ_n oh_v[b,n,f] · emb[b,n,e]  → [TB, F, F·k]
    C = jax.lax.dot_general(
        oh_v, emb,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    C4 = C.reshape(TB, F, F, k)

    # pair dots: inter[b,t,f] = 0.5·Σ_k C4[b,t,f,k]·C4[b,f,t,k]
    C4_t = jnp.swapaxes(C4, 1, 2)
    inter = 0.5 * jnp.sum(C4 * C4_t, axis=-1)  # [TB, F, F]

    # diagonal self-interaction subtraction:
    # 0.5·Σ_{n∈t} v²·‖w_n→t‖² (reference: src/block_ffm.rs:236-244)
    e4 = emb.reshape(TB, N, F, k)
    own = jnp.sum(e4 * onehot[:, :, :, None], axis=2)  # [TB, N, k] = w_n→field(n)
    self_n = 0.5 * jnp.sum(own * own, axis=-1) * vals * vals  # [TB, N]
    diag = jax.lax.dot_general(  # [TB, F]
        self_n[:, None, :], onehot,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (F, F), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (F, F), 1)).astype(jnp.float32)
    inter = inter - diag[:, :, None] * eye[None]

    # triangle flatten via the precomputed selection matrix
    out_ref[:] = jnp.dot(inter.reshape(TB, F * F), tri_sel_ref[:],
                         preferred_element_type=jnp.float32)


def fits(B: int, N: int, F: int, k: int, tile: int = 256) -> bool:
    """Rough VMEM budget check for one tile."""
    Fk = F * k
    vmem = tile * (N * Fk + 2 * F * Fk + N * F + N * k + 2 * F * F) * 4
    return vmem < 12 * 1024 * 1024 and B % tile == 0


@functools.partial(jax.jit, static_argnames=("F", "k", "tile", "interpret"))
def ffm_triangle(emb, vals, fields, *, F: int, k: int, tile: int = 256,
                 interpret: bool = False):
    """[B, N, F·k] slabs (+ vals/fields [B, N]) → [B, F(F+1)/2] triangle."""
    B, N, Fk = emb.shape
    assert Fk == F * k
    T = F * (F + 1) // 2
    tile = min(tile, B)
    tri_sel = jnp.asarray(_tri_index_matrices(F))
    grid = (B // tile,)
    return pl.pallas_call(
        functools.partial(_ffm_kernel, F=F, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N, Fk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F * F, T), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, T), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T), jnp.float32),
        interpret=interpret,
    )(vals, fields, emb, tri_sel)

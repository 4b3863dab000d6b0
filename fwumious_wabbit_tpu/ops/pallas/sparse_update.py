"""Fused sparse AdaGrad row update as a Pallas table-sweep kernel.

The production XLA path (ops/adagrad.apply_rows: scatter-add g² → gather
bumped acc → rate → scatter-sub) lowers each scatter to a per-row sequential
update — measured 47 ms for 196k touched rows on a 2^29 table on the real
v5e (10.6 GB/s effective, 14× the cost of the row *gather* of the same
rows; scripts/sparse_update_bench.py). This kernel reformulates the update
as a **streaming sweep** (the reference's analogous hand-tuned hot path is
src/block_ffm.rs:903-1202 — SSE over contiguous weights; same idea, TPU
shapes):

1. outside the kernel: sort the update rows by row id (one argsort of K
   ints + one [K,128] permutation gather — both fast row-path ops), pack
   each row's id into a second 128-lane group beside its gradient row
   (ids < 2^24 are exact in f32; Mosaic requires 128-lane-aligned slices,
   so a (K,1) id column cannot be DMA'd directly), and ``searchsorted``
   the chunk boundaries;
2. grid over table CHUNKS of 2048 rows: Pallas streams each chunk of ``w``
   and ``acc`` HBM→VMEM→HBM with automatic double buffering (aliased
   outputs — the table is updated in place, sequential HBM traffic at
   full bandwidth instead of 512-byte random access);
3. per chunk, the updates belonging to it form a CONTIGUOUS range of the
   sorted stream — DMA'd in T-aligned (T, 256) tiles and accumulated into
   dense per-chunk Σg / Σg² buffers with a one-hot matmul (MXU work —
   duplicates sum for free, in any order; rows outside the chunk mask to
   zero, which also makes the T-alignment of tile starts harmless);
4. one vectorized AdaGrad tail per chunk: ``acc += Σg²``,
   ``w -= rate(acc_new) · Σg`` with the arithmetic LUT rate
   (ops/adagrad.lut_rate_compute) or the flex power rule.

Semantics are IDENTICAL to apply_rows (same Σg / Σg² per weight, rate from
the fully-bumped accumulator) up to f32 summation order; asserted in
tests/test_pallas_sparse_update.py. dedup_rows / batch_mean_grads run
before this, exactly as for the XLA path.

Traffic: 2·(|w|+|acc|) sequential bytes per call, independent of K — the
right trade above ~2% row density (large-batch training always is; tiny
batches should keep the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..adagrad import OPT_ADAGRAD_FLEX, OPT_ADAGRAD_LUT, OPT_SGD
from ..tables import LANE

UPD_TILE = 128  # update rows streamed per DMA (tile starts are T-aligned)
VMEM_LIMIT = 64 * 1024 * 1024  # the 16 MB scoped default is 88 KB short at
# chunk 2048; v5e has 128 MB physical VMEM

# tests set this to run the kernel through the Pallas interpreter on CPU
_INTERPRET = False


def worth_it(num_rows: int, num_updates: int) -> bool:
    """Static auto-dispatch rule (see SPARSE_UPDATE_NOTES.md for the
    measurements): the sweep wins 1.4–11× for tables ≥ 2^26 flat floats
    down to ~0.8% row density (its cost is table-bound, XLA's is
    update-bound — crossover at 2^29 measured near K ≈ rows/128).

    2^25 tables at large K are a measured TIE against XLA's *fast* scatter
    mode (sweep 10.7 ms vs 10.3 ms at K=196k) — but XLA's scatter emission
    is bimodal per process (~2× slow mode, SPARSE_UPDATE_NOTES.md), so the
    deterministic sweep is the better expected value once enough updates
    amortize the table pass (K ≥ 2^17)."""
    if num_rows >= (1 << 26) // LANE:
        return num_updates * 128 >= num_rows
    return num_rows >= (1 << 25) // LANE and num_updates >= (1 << 17)


def _pow_mpt(x, power_t: float):
    """x^(−power_t) with fast paths: rsqrt for the ubiquitous 0.5 (a native
    VPU op — the generic pow is exp·log and dominates a full-table rate
    pass), 1 for 0."""
    if power_t == 0.5:
        return jax.lax.rsqrt(x)
    if power_t == 0.0:
        return jnp.ones_like(x)
    if power_t == 1.0:
        return 1.0 / x
    return jnp.power(x, jnp.float32(-power_t))


def _rate(acc, kind: int, lr: float, power_t: float, iag: float):
    """Vectorized AdaGrad rate (mirrors ops/adagrad lut_rate_compute /
    flex_update)."""
    if kind == OPT_ADAGRAD_LUT:
        shift = jnp.uint32(31 - 11)
        key = jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(acc, jnp.uint32), shift)

        def edge(k):
            v = jax.lax.bitcast_convert_type(
                jax.lax.shift_left(k, shift), jnp.float32)
            v = jnp.where(jnp.abs(v) < jnp.float32(2.0 ** -126),
                          jnp.float32(0.0), v)
            return v + jnp.float32(iag)

        val = jnp.float32(lr) * jnp.float32(0.5) * (
            _pow_mpt(edge(key), power_t)
            + _pow_mpt(edge(key + jnp.uint32(1)), power_t)
        )
        return jnp.where(jnp.isfinite(val), val, jnp.float32(lr))
    # flex: lr · acc^(−power_t); non-finite products are zeroed by caller
    return jnp.float32(lr) * _pow_mpt(acc, power_t)


def _kernel(kind, lr, power_t, iag, chunk, *refs):
    starts_ref = refs[0]  # scalar-prefetch: [n_chunks+1] i32
    if kind == OPT_SGD:   # no optimizer state: w in/out only
        w_ref, packed_hbm, w_out, gsum_ref, gsq_ref, tile_ref, sem = refs[1:]
        acc_ref = acc_out = None
    else:
        (w_ref, acc_ref, packed_hbm, w_out, acc_out,
         gsum_ref, gsq_ref, tile_ref, sem) = refs[1:]
    c = pl.program_id(0)
    n = pl.num_programs(0)
    lo = starts_ref[c]
    hi = starts_ref[c + 1]
    base = c * chunk

    gsum_ref[:] = jnp.zeros_like(gsum_ref)
    gsq_ref[:] = jnp.zeros_like(gsq_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (UPD_TILE, chunk), 1).astype(
        jnp.float32)
    base_f = jnp.float32(1.0) * base  # ids are exact f32 (< 2^24)

    # -- cross-chunk tile prefetch (double buffer) --------------------------
    # Most nonempty chunks consume exactly one update tile; waiting for its
    # DMA serialized ~11 µs per chunk against the (auto-pipelined) table
    # stream. Invariant: on entry to a NONEMPTY chunk c, slot c%2 already
    # holds its first tile (started by chunk c−1, or by the c==0 warmup);
    # each chunk starts the next nonempty chunk's first tile before
    # consuming its own. Extra tiles (rare) stream through the same slot
    # serially. Scratch: tile_ref [2, T, 256], sem [2].
    def start_tile0(cc, slot):
        lo2 = starts_ref[cc]
        k0 = pl.multiple_of((lo2 // UPD_TILE) * UPD_TILE, UPD_TILE)
        pltpu.make_async_copy(
            packed_hbm.at[pl.ds(k0, UPD_TILE), :], tile_ref.at[slot],
            sem.at[slot]).start()

    @pl.when((c == 0) & (hi > lo))
    def _():
        start_tile0(0, 0)

    nxt = jnp.minimum(c + 1, n - 1)
    lo_n = starts_ref[nxt]
    hi_n = starts_ref[nxt + 1]

    @pl.when((c + 1 < n) & (hi_n > lo_n))
    def _():
        start_tile0(nxt, (c + 1) % 2)

    slot = c % 2

    def tile_body(i, _):
        k0 = pl.multiple_of((lo // UPD_TILE + i) * UPD_TILE, UPD_TILE)
        dma = pltpu.make_async_copy(
            packed_hbm.at[pl.ds(k0, UPD_TILE), :], tile_ref.at[slot],
            sem.at[slot])

        @pl.when(i > 0)  # tile 0's DMA was started by the predecessor
        def _():
            dma.start()

        dma.wait()
        tile = tile_ref[slot]
        g = tile[:, :LANE]
        ids = jnp.max(tile[:, LANE:], axis=1, keepdims=True)  # [T, 1] f32
        rows = ids - base_f
        # rows outside this chunk (neighbor chunks in a shared tile, sort
        # padding with id == num_rows) match nothing
        # bf16 one-hot: 0/1 are exact, halves the [T, chunk] footprint
        oh = jnp.where((rows >= 0.0) & (rows < jnp.float32(chunk)),
                       (rows == col).astype(jnp.bfloat16),
                       jnp.bfloat16(0.0))
        # The MXU's default f32 path is a single bf16 pass — a ~2^-8
        # relative error on every update (measured 5e-4 absolute), far above
        # scatter exactness; Precision.HIGHEST does not lower in Mosaic
        # here. Manual bf16×3 split instead: oh is exactly representable,
        # each split term's products are exact, f32 accumulation recovers
        # full f32 precision (same rounding class as the XLA scatter).
        # Σg and Σg² share one matmul per split via operand concatenation.
        m = g if kind == OPT_SGD else jnp.concatenate([g, g * g], axis=1)

        p_hi = m.astype(jnp.bfloat16)
        r = m - p_hi.astype(jnp.float32)
        p_mid = r.astype(jnp.bfloat16)
        p_lo = (r - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        out = None
        for part in (p_hi, p_mid, p_lo):
            d = jax.lax.dot_general(
                oh, part, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = d if out is None else out + d
        gsum_ref[:] += out[:, :LANE]
        if kind != OPT_SGD:
            gsq_ref[:] += out[:, LANE:]
        return 0

    # EMPTY chunks must run zero tiles: with lo == hi and lo % T ≠ 0 the
    # cdiv expression evaluates to 1, and that phantom tile would WAIT on a
    # semaphore nobody signalled (predecessors only prefetch for nonempty
    # chunks) — a device hang/crash that only data with empty chunks
    # between occupied ones can trigger (uniform benchmark ids never did;
    # real CTR id distributions do).
    n_tiles = jnp.where(hi > lo, pl.cdiv(hi, UPD_TILE) - lo // UPD_TILE, 0)
    jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    # untouched chunks (common at low densities) are a pure copy-through
    @pl.when(hi == lo)
    def _():
        w_out[:] = w_ref[:]
        if kind != OPT_SGD:
            acc_out[:] = acc_ref[:]

    @pl.when(hi > lo)
    def _():
        if kind == OPT_SGD:
            w_out[:] = w_ref[:] - jnp.float32(lr) * gsum_ref[:]
        else:
            acc_new = acc_ref[:] + gsq_ref[:]
            acc_out[:] = acc_new
            upd = gsum_ref[:] * _rate(acc_new, kind, lr, power_t, iag)
            if kind == OPT_ADAGRAD_FLEX:
                upd = jnp.nan_to_num(upd, nan=0.0, posinf=0.0, neginf=0.0)
            w_out[:] = w_ref[:] - upd


def _pick_chunk(num_rows: int) -> int:
    # per-grid-step overhead (~10 µs) dominates at small chunks, VMEM
    # limits large ones; 2048 rows × (w,acc in+out, double-buffered) = 8 MB
    # + scratch fits with the bf16 one-hot and 128-row tiles
    chunk = 2048
    while chunk > 8 and num_rows % chunk:
        chunk //= 2
    return chunk if num_rows % chunk == 0 else 0


@functools.partial(
    jax.jit, static_argnames=("lr", "power_t", "iag", "kind"),
    donate_argnums=(0, 1))
def sparse_adagrad_update(w, acc, rid, grows, lr, power_t, iag,
                          kind: int = OPT_ADAGRAD_LUT):
    """apply_rows as a table-sweep Pallas kernel. Returns (w', acc').

    ``w`` and ``acc`` are DONATED (updated in place — without donation XLA
    materializes full-table copies around the aliased pallas_call, which
    OOMs HBM at 2^29). ``acc`` may be None only for SGD (returned as None).
    Table row count must be divisible by a power-of-two chunk (all real
    tables are)."""
    R = w.shape[0]
    chunk = _pick_chunk(R)
    if chunk == 0:
        raise ValueError(f"table rows {R} not divisible by a pow2 chunk")
    n_chunks = R // chunk

    K = rid.shape[0]
    order = jnp.argsort(rid)
    rs = jnp.take(rid, order).astype(jnp.int32)
    gs = jnp.take(grows, order, axis=0).astype(jnp.float32)
    # pad the stream to a tile multiple + one guard tile so every T-aligned
    # dynamic slice stays in bounds; pad ids = R sort-last and match no chunk
    kp = ((K + UPD_TILE - 1) // UPD_TILE + 1) * UPD_TILE
    rs_p = jnp.concatenate([rs, jnp.full(kp - K, R, jnp.int32)])
    gs_p = jnp.concatenate([gs, jnp.zeros((kp - K, LANE), jnp.float32)])
    packed = jnp.concatenate(
        [gs_p, jnp.broadcast_to(rs_p.astype(jnp.float32)[:, None], (kp, LANE))],
        axis=1,
    )  # [kp, 256]
    bounds = (jnp.arange(n_chunks + 1, dtype=jnp.int32) * chunk).astype(rs.dtype)
    starts = jnp.searchsorted(rs, bounds).astype(jnp.int32)

    chunk_spec = pl.BlockSpec((chunk, LANE), lambda c, s: (c, 0),
                              memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((chunk, LANE), jnp.float32),       # Σg
        pltpu.VMEM((chunk, LANE), jnp.float32),       # Σg²
        pltpu.VMEM((2, UPD_TILE, 2 * LANE), jnp.float32),  # tile slots
        pltpu.SemaphoreType.DMA((2,)),
    ]
    kernel = functools.partial(_kernel, kind, float(lr), float(power_t),
                               float(iag), chunk)
    if kind == OPT_SGD:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_chunks,),
            in_specs=[chunk_spec, pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[chunk_spec],
            scratch_shapes=scratch,
        )
        (w2,) = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(w.shape, w.dtype),),
            input_output_aliases={1: 0},  # starts(0), w(1), packed(2)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT),
            interpret=_INTERPRET,
        )(starts, w, packed)
        return (w2, acc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_chunks,),
        in_specs=[chunk_spec, chunk_spec,
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[chunk_spec, chunk_spec],
        scratch_shapes=scratch,
    )
    w2, acc2 = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(w.shape, w.dtype),
            jax.ShapeDtypeStruct(acc.shape, acc.dtype),
        ),
        # operand order: starts(0), w(1), acc(2), packed(3)
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=_INTERPRET,
    )(starts, w, acc, packed)
    return (w2, acc2)

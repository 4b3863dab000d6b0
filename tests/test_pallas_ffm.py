"""Pallas fused FFM interaction kernel vs the XLA path (interpreter mode —
see the status note in ops/pallas/ffm.py for why the XLA path is the
production default on current Mosaic)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fwumious_wabbit_tpu.config.model_instance import ModelInstance, Optimizer
from fwumious_wabbit_tpu.models.model import FwModel
from fwumious_wabbit_tpu.ops.pallas.ffm import ffm_triangle, fits


def make_model(F, k):
    mi = ModelInstance()
    mi.ffm_k = k
    mi.ffm_bit_precision = 12
    mi.ffm_fields = [[] for _ in range(F)]
    mi.optimizer = Optimizer.ADAGRAD_FLEX
    mi.add_constant_feature = False
    return FwModel(mi)


@pytest.mark.parametrize("F,k,N,B", [(4, 4, 6, 8), (16, 8, 12, 16), (3, 2, 5, 4)])
def test_pallas_matches_xla(F, k, N, B):
    model = make_model(F, k)
    rng = np.random.default_rng(F * 100 + k)
    emb = rng.normal(size=(B, N, F * k)).astype(np.float32)
    vals = rng.uniform(0.5, 2, (B, N)).astype(np.float32)
    fields = rng.integers(-1, F, (B, N)).astype(np.int32)  # incl. -1 padding
    batch = {"ffm_vals": jnp.asarray(vals), "ffm_fields": jnp.asarray(fields)}
    ref = model.triangle(model.ffm_outputs(jnp.asarray(emb), batch))
    got = ffm_triangle(jnp.asarray(emb), jnp.asarray(vals), jnp.asarray(fields),
                       F=F, k=k, tile=B, interpret=True)
    # different contraction orders (dot_general vs einsum) → ulp-level noise
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fits_budget():
    assert fits(32768, 32, 16, 8, tile=256)
    assert not fits(32768, 512, 64, 64, tile=256)

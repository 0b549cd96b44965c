"""Multi-device DSM fusion == single-device DSM (VERDICT r2 item 3).

The sharded fuser must reproduce the sequential streaming accumulation
exactly (same tile-local robust-gate grouping, additive sums merged by
psum instead of a Python loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcmi_tpu.parallel import make_mesh
from pcmi_tpu.parallel.fusion_sharded import sharded_dsm_update
from pcmi_tpu.pipelines.streaming import StreamingDSM, dsm_update, dsm_finalize


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("robust_sigma", [0.0, 3.0])
def test_sharded_dsm_matches_sequential(rng, robust_sigma):
    ny = nx = 64
    n_blocks, n_pts = 8, 4096
    xy = rng.uniform(-4.0, 68.0, (n_blocks, n_pts, 2)).astype(np.float32)
    values = rng.normal(20.0, 5.0, (n_blocks, n_pts)).astype(np.float32)
    # blunder tail for the robust gate to chew on + zero-weight padding
    blunder = rng.uniform(size=(n_blocks, n_pts)) < 0.03
    values = np.where(blunder, values + rng.normal(0, 60.0, values.shape),
                      values).astype(np.float32)
    weights = (rng.uniform(size=(n_blocks, n_pts)) > 0.1).astype(np.float32)

    # sequential reference: one dsm_update per block
    acc = StreamingDSM(wsum=jnp.zeros((ny, nx)), vsum=jnp.zeros((ny, nx)),
                       vsq=jnp.zeros((ny, nx)))
    for k in range(n_blocks):
        acc = dsm_update(acc, jnp.asarray(xy[k]), jnp.asarray(values[k]),
                         jnp.asarray(weights[k]), (0.0, 0.0), 1.0, (ny, nx),
                         robust_sigma=robust_sigma)

    mesh = make_mesh(data=2, tile=4)
    fuse = sharded_dsm_update(mesh, (0.0, 0.0), 1.0, (ny, nx),
                              robust_sigma=robust_sigma)
    acc_sh = fuse(jnp.asarray(xy), jnp.asarray(values), jnp.asarray(weights))

    np.testing.assert_allclose(np.asarray(acc_sh.wsum), np.asarray(acc.wsum),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(acc_sh.vsum), np.asarray(acc.vsum),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(acc_sh.vsq), np.asarray(acc.vsq),
                               rtol=1e-5, atol=5e-2)
    dsm_a, _ = dsm_finalize(acc)
    dsm_b, _ = dsm_finalize(acc_sh)
    np.testing.assert_allclose(dsm_b, dsm_a, atol=1e-4, equal_nan=True)

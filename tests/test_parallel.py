"""Mesh-sharded batch reconstruction on a virtual 8-device CPU mesh."""

import numpy as np
import jax
from numpy.testing import assert_allclose

from muse_psfr_tpu import TINY_CONFIG, reconstruct_batch, default_mesh


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_batch_matches_single_device():
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    lbda = np.linspace(600, 900, 3)
    rng = np.random.default_rng(1)
    B = 8
    seeing = rng.uniform(0.6, 1.4, B)
    GL = rng.uniform(0.3, 0.9, B)
    L0 = rng.uniform(10, 28, B)
    mask = np.ones((B, 4))
    mask[2, 3] = 0.0

    ref = reconstruct_batch(seeing, GL, L0, mask, lbda, cfg=cfg, chunk=3)
    mesh = default_mesh()
    shard = reconstruct_batch(seeing, GL, L0, mask, lbda, cfg=cfg,
                              chunk=8, mesh=mesh)
    assert shard.shape == (B, 3, cfg.dimpsf, cfg.dimpsf)
    assert_allclose(shard, ref, atol=1e-12)


def test_batch_padding_with_mesh():
    """Batch size not divisible by the mesh is padded and un-padded."""
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    lbda = np.array([700.0])
    B = 5
    seeing = np.full(B, 1.0)
    GL = np.full(B, 0.7)
    L0 = np.full(B, 25.0)
    mask = np.ones((B, 4))
    mesh = default_mesh()
    out = reconstruct_batch(seeing, GL, L0, mask, lbda, cfg=cfg,
                            chunk=8, mesh=mesh)
    assert out.shape[0] == B
    # identical conditions -> identical PSFs
    assert_allclose(out, np.repeat(out[:1], B, axis=0), atol=1e-12)


def test_production_shape_lowers_under_mesh():
    """The dim=1280, nl=35 production pipeline SPMD-partitions under the
     8-device mesh at its real shape (lowering only — executing the full
    grid on the CPU test backend would take minutes; the partitioning,
    which is what multi-chip correctness rides on, is decided at
    lowering).  Mirrors the reference's only concurrency contract, the
    joblib row map (psfrec.py:1082-1083)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from muse_psfr_tpu.config import GalacsiConfig
    from muse_psfr_tpu.parallel.batch import _reconstruct_vmapped

    cfg = GalacsiConfig()                      # full production config
    sh = NamedSharding(default_mesh(), P("rows"))
    B, f32 = 8, np.float32
    sds = jax.ShapeDtypeStruct
    low = _reconstruct_vmapped.lower(
        sds((B,), f32, sharding=sh), sds((B,), f32, sharding=sh),
        sds((B,), f32, sharding=sh), sds((B, 4), f32, sharding=sh),
        sds((35,), f32), (100.0, 10000.0), 12.0, 1, cfg)
    header = low.as_text().split("\n", 1)[0]
    assert "mhlo.num_partitions = 8" in header


def test_compute_psf_from_sparta_with_mesh():
    """The top-level API shards its batch over a mesh."""
    import numpy as np
    from muse_psfr_tpu import (compute_psf_from_sparta, create_sparta_table,
                               HDUList, FitTable)
    cfg = TINY_CONFIG.with_(dtype="float64", fit_dtype="float64")
    hdu = create_sparta_table(nlines=5)
    res_m = compute_psf_from_sparta(HDUList([hdu.copy()]), lmin=700,
                                    lmax=900, nl=2, cfg=cfg,
                                    mesh=default_mesh(), chunk=8)
    res_s = compute_psf_from_sparta(HDUList([hdu]), lmin=700, lmax=900,
                                    nl=2, cfg=cfg)
    a = FitTable.from_hdu(res_m["FIT_ROWS"])
    b = FitTable.from_hdu(res_s["FIT_ROWS"])
    assert_allclose(a["fwhm"], b["fwhm"], atol=1e-12)
    assert_allclose(res_m["PSF_MEAN"].data, res_s["PSF_MEAN"].data,
                    atol=1e-12)

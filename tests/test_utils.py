"""Utility-layer tests: profiling timers, visualize, mesh edge cases."""

import numpy as np

from fast_cwdm_tpu.utils import StepTimer, visualize
from fast_cwdm_tpu.utils.logger import profile, configure, dumpkvs


def test_step_timer_profile_line():
    t = StepTimer()
    with t.phase("data"):
        pass
    with t.phase("step"):
        pass
    line = t.report(42)
    assert line.startswith("[PROFILE] Step 42:")
    assert "Data=" in line and "Total=" in line
    # accumulators reset after report
    assert all(v == 0.0 for v in t.acc.values())


def test_visualize_minmax():
    img = np.array([[1.0, 3.0], [5.0, 9.0]])
    out = visualize(img)
    assert out.min() == 0.0 and out.max() == 1.0
    flat = visualize(np.full((3, 3), 7.0))
    assert (flat == 0).all()  # constant image → zeros, no NaNs


def test_profile_decorator(tmp_path):
    configure(str(tmp_path), format_strs=[])

    @profile("myfn")
    def f(a):
        return a + 1

    assert f(1) == 2
    out = dumpkvs()
    assert "wait_myfn" in out


def test_hybrid_mesh_single_host_fallback():
    from fast_cwdm_tpu.parallel import make_hybrid_mesh

    mesh = make_hybrid_mesh(sp=2)  # single process → plain mesh
    assert dict(mesh.shape) == {"data": 4, "sp": 2}


def test_fusable_conv_standalone_matches_nnconv():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from fast_cwdm_tpu.models.unet import FusableConv3d

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 6, 6, 4))
    mine = FusableConv3d(8)
    p = mine.init(jax.random.PRNGKey(1), x)["params"]
    y1 = mine.apply({"params": p}, x)
    ref_conv = nn.Conv(8, (3, 3, 3), padding=[(1, 1)] * 3)
    y2 = ref_conv.apply(
        {"params": {"kernel": p["kernel"], "bias": p["bias"]}}, x
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_devtime_cpu_smoke():
    """devtime degrades to total_ms=0.0 without a TPU plane but still runs
    the function and the profiler round trip."""
    import jax
    import jax.numpy as jnp

    from fast_cwdm_tpu.utils.devtime import devtime

    f = jax.jit(lambda x: x * 2 + 1)
    out = devtime(f, jnp.ones((128, 128)), iters=2)
    assert out["total_ms"] >= 0.0

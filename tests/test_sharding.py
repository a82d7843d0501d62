"""Multi-device sharding: the chain scales over a data-parallel mesh.

Runs on the virtual 8-device CPU mesh from conftest; the driver separately
dry-run-compiles the same shardings through ``__graft_entry__``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the jaxlib serializer can crash writing this module's large
# (mesh-sharded / lifecycle) executables — see conftest fixture
pytestmark = pytest.mark.usefixtures("no_persistent_cache")
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audioforge_tpu.ops import compressor as comp_ops
from audioforge_tpu.runtime import chain as chain_rt


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_chain_runs_sharded_over_dp_mesh(rng):
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    FS, BLOCK, BATCH, NB = 48000.0, 480, 16, 2

    ccfg = comp_ops.CompressorConfig(sample_rate=FS, enabled=True,
                                     block_samples=BLOCK)
    cfg = chain_rt.ChainConfig(sample_rate=FS, eq_enabled=True,
                               compressor_enabled=True, limiter_enabled=True,
                               compressor=ccfg)
    params = comp_ops.compressor_params(ccfg)
    state = chain_rt.chain_init(cfg, params, batch_shape=(BATCH,))
    blocks = jnp.asarray(
        0.1 * rng.standard_normal((BATCH, NB, BLOCK)), jnp.float32
    )

    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def put(a):
        a = jnp.asarray(a)
        if a.ndim and a.shape[0] == BATCH:
            return jax.device_put(a, batch_sharding)
        if a.ndim >= 2 and a.shape[1] == BATCH:  # eq z: section axis first
            return jax.device_put(a, NamedSharding(mesh, P(None, "dp")))
        return jax.device_put(a, replicated)

    state = jax.tree_util.tree_map(put, state)
    blocks = jax.device_put(blocks, batch_sharding)

    @jax.jit
    def step(params, state, blocks):
        new_state, _, stats = chain_rt.chain_run(
            cfg, params, state, blocks, return_audio=False
        )
        # a cross-device corpus reduction rides the mesh
        return new_state, jnp.mean(stats["output_true_peak"])

    new_state, corpus_peak = step(params, state, blocks)
    assert np.isfinite(float(corpus_peak))
    # the batch axis stays sharded through the step
    out_sharding = new_state["compressor"]["current_gr_db"].sharding
    assert out_sharding.is_equivalent_to(batch_sharding, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs the 8-device mesh")
def test_vmapped_candidate_sweep_sharded(rng):
    """The flagship calibration shape: candidates sharded over devices."""
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("dp",))
    FS, BLOCK, CANDIDATES, NB = 48000.0, 480, 16, 2
    ccfg = comp_ops.CompressorConfig(sample_rate=FS, enabled=True,
                                     block_samples=BLOCK)
    cfg = chain_rt.ChainConfig(sample_rate=FS, eq_enabled=False,
                               compressor_enabled=True, limiter_enabled=True,
                               compressor=ccfg)
    thresholds = jnp.linspace(-40.0, -10.0, CANDIDATES)
    params = comp_ops.compressor_params(ccfg)
    params = dict(params, threshold_db=thresholds.astype(jnp.float32))
    state = chain_rt.chain_init(cfg, None, batch_shape=(CANDIDATES,))
    audio = jnp.asarray(
        np.broadcast_to(
            0.3 * rng.standard_normal((NB, BLOCK)), (CANDIDATES, NB, BLOCK)
        ),
        jnp.float32,
    )
    shard = NamedSharding(mesh, P("dp"))

    def put(a):
        a = jnp.asarray(a)
        if a.ndim and a.shape[0] == CANDIDATES:
            return jax.device_put(a, shard)
        return jax.device_put(a, NamedSharding(mesh, P()))

    params = jax.tree_util.tree_map(put, params)
    state = jax.tree_util.tree_map(put, state)
    audio = jax.device_put(audio, shard)

    @jax.jit
    def sweep(params, state, audio):
        _, _, stats = chain_rt.chain_run(cfg, params, state, audio,
                                         return_audio=False)
        return jnp.max(stats["compressor_gain_reduction_db"], axis=-1)

    gr = np.asarray(sweep(params, state, audio))
    assert gr.shape == (CANDIDATES,)
    # lower thresholds compress more
    assert gr[0] > gr[-1]


class TestFleetHelpers:
    """audioforge_tpu.parallel.fleet — the multi-chip calibration recipe
    (docs/multichip_fleet.md)."""

    def test_fleet_mesh_covers_devices(self):
        from audioforge_tpu.parallel import fleet_mesh

        mesh = fleet_mesh()
        assert mesh.axis_names == ("candidates",)
        assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
        assert fleet_mesh(4).devices.size == 4
        import pytest
        with pytest.raises(ValueError):
            fleet_mesh(10_000)

    def test_pad_candidates(self):
        from audioforge_tpu.parallel import pad_candidates

        cands = [{"i": i} for i in range(5)]
        padded, n = pad_candidates(cands, 8)
        assert n == 5 and len(padded) == 8
        assert padded[5] == padded[6] == padded[7] == cands[-1]
        same, n = pad_candidates(cands, 1)
        assert n == 5 and len(same) == 5

    def test_batch_axis_detection(self):
        from audioforge_tpu.parallel import batch_axis_of

        assert batch_axis_of((16, 480), (480,)) == 0
        assert batch_axis_of((40, 16, 2), (40, 2)) == 1  # EQ z-state layout
        assert batch_axis_of((16,), ()) == 0
        assert batch_axis_of((2, 5), (2, 5)) is None     # shared leaf
        assert batch_axis_of((3, 4, 5), (9, 9)) is None

    def test_sharded_candidate_sweep_matches_plain(self, rng):
        """The flagship recipe: simulate_auto_eq_chain_batched with a mesh
        must reproduce the unsharded diagnostics, including with a
        candidate count that needs padding."""
        from audioforge_tpu.api import simulate_auto_eq_chain_batched
        from audioforge_tpu.ops import eq as eq_ops
        from audioforge_tpu.parallel import fleet_mesh

        fs = 48000.0
        t = np.arange(int(fs * 0.5)) / fs
        speech = (
            0.15 * np.sin(2 * np.pi * 220 * t)
            * (np.sin(2 * np.pi * 3.0 * t) > 0)
            + 0.01 * rng.standard_normal(t.size)
        ).astype(np.float32)
        bands = [
            (b.frequency_hz, 1.0 if i == 4 else 0.0, 4.33)
            for i, b in enumerate(eq_ops.default_bands())
        ]
        cands = [
            {"threshold_db": -45.0 + 3.0 * i, "ratio": 2.0 + 0.2 * i,
             "attack_ms": 10.0, "release_ms": 200.0}
            for i in range(5)  # 5 streams over 8 devices: pads to 8
        ]
        plain = simulate_auto_eq_chain_batched(speech, fs, bands, None,
                                               cands)
        sharded = simulate_auto_eq_chain_batched(speech, fs, bands, None,
                                                 cands, mesh=fleet_mesh())
        assert len(plain) == len(sharded) == 5
        for a, b in zip(plain, sharded):
            for k, v in a.items():
                if isinstance(v, float) and not k.endswith("runtime_ms"):
                    assert abs(v - float(b[k])) < 1e-5, k

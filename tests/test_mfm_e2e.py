"""End-to-end MFM miniature runs (SURVEY.md section 4 integration strategy):
small 4-mode runs must train stably, cover all modes after IS correction,
and beat naive flow samples on MMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import MFMConfig
from mfm_tpu.drivers import evaluate_samples, next_beta, run_mfm, sample_flow
from mfm_tpu.targets import IndepGaussian, four_mode_mixture


def _small_cfg(**overrides):
    base = dict(
        example="4-mode",
        dim=2,
        num_chain=64,
        learning_iter=150,
        step_size=0.2,
        hidden_x=(32, 32),
        hidden_t=(32, 32),
        hidden_xt=(32, 32),
        fourier_dim=16,
        ode_steps=12,
        eval_iter=8,
        chunk_size=50,
        learning_rate=2e-3,
        anneal_iter=40,
        num_anneal_temp=40,
    )
    base.update(overrides)
    return MFMConfig(**base)


class TestNextBeta:
    def test_monotone_and_bracketed(self, key):
        logliks = jax.random.normal(key, (128,)) * 20
        b1 = float(next_beta(0.0, logliks, 0.95, 128))
        assert 0.0 < b1 <= 1.0
        b2 = float(next_beta(b1, logliks, 0.95, 128))
        assert b1 <= b2 <= 1.0

    def test_easy_target_jumps_to_one(self, key):
        logliks = jax.random.normal(key, (128,)) * 1e-4
        assert float(next_beta(0.0, logliks, 0.95, 128)) == 1.0


class TestMFMEndToEnd:
    @pytest.fixture(scope="class")
    def run_result(self):
        target = four_mode_mixture()
        cfg = _small_cfg()
        run = run_mfm(target, cfg)
        return target, cfg, run

    def test_training_is_finite(self, run_result):
        """The FM loss scale tracks the chain spread (targets are x1 - x0),
        so it is not monotone during MFM; finiteness + the mode-coverage and
        MMD gates below are the quality checks."""
        _, _, run = run_result
        losses = np.asarray(run.metrics["loss"])
        assert np.isfinite(losses).all()
        betas = np.asarray(run.metrics["beta"])
        assert (np.diff(betas) >= -1e-6).all()  # tempering is monotone

    def test_beta_reaches_one(self, run_result):
        _, _, run = run_result
        assert float(run.beta) == 1.0

    def test_acceptance_sane(self, run_result):
        _, _, run = run_result
        acc = np.asarray(run.metrics["acceptance_mean"])
        assert np.isfinite(acc).all()
        assert 0.05 < acc.mean() <= 1.0

    def test_chains_cover_modes(self, run_result):
        """After training, MALA chains + flow refreshes should populate all
        four quadrants (pure MALA from N(0,1) init cannot cross modes)."""
        _, _, run = run_result
        pos = np.asarray(run.chain.position)
        quad = (pos[:, 0] > 0).astype(int) * 2 + (pos[:, 1] > 0).astype(int)
        assert len(np.unique(quad)) == 4

    def test_is_correction_improves_mmd(self, run_result):
        target, cfg, run = run_result
        key = jax.random.PRNGKey(123)
        flow_s, exact_s, log_w = sample_flow(run, key, 512, target)
        real = target.sample(jax.random.fold_in(key, 1), (512,))
        m = evaluate_samples(target, flow_s, exact_s, real)
        assert np.isfinite(m["logpdf"]) and np.isfinite(m["logpdf_star"])
        assert m["mmd_star"] < 0.25
        # IS-corrected samples cover all modes
        quad = (np.asarray(exact_s)[:, 0] > 0).astype(int) * 2 + (
            np.asarray(exact_s)[:, 1] > 0
        ).astype(int)
        assert len(np.unique(quad)) == 4


class TestMFMVariants:
    @pytest.mark.slow
    def test_real_samples_mode(self):
        """mcmc_per_flow_steps < 0 trains the flow on exact target draws
        (reference use_real_samples, exe_flow_matching.py:328,382-386)."""
        target = four_mode_mixture()
        cfg = _small_cfg(mcmc_per_flow_steps=-1.0, learning_iter=60)
        run = run_mfm(target, cfg)
        losses = np.asarray(run.metrics["loss"])
        assert np.isfinite(losses).all()
        # with a FIXED data distribution the FM loss must come down
        assert losses[-10:].mean() < losses[:10].mean()

    @pytest.mark.slow
    def test_hutchinson_mode(self):
        target = four_mode_mixture()
        cfg = _small_cfg(hutchinson=True, learning_iter=40, chunk_size=40)
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()

    @pytest.mark.slow
    def test_cis_kernel(self):
        target = four_mode_mixture()
        cfg = _small_cfg(
            num_importance_samples=4, learning_iter=40, chunk_size=40,
            mcmc_per_flow_steps=3,
        )
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()

    @pytest.mark.slow
    def test_indep_mh_kernel(self):
        target = four_mode_mixture()
        cfg = _small_cfg(
            num_importance_samples=-1, learning_iter=40, chunk_size=40,
            mcmc_per_flow_steps=3,
        )
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()

    @pytest.mark.slow
    def test_fractional_interleave(self):
        """0 < mcmc_per_flow_steps < 1: mostly flow steps."""
        target = four_mode_mixture()
        cfg = _small_cfg(
            mcmc_per_flow_steps=0.5, learning_iter=30, chunk_size=30
        )
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()


class TestMFMKernelChoice:
    @pytest.mark.slow
    def test_hmc_kernel(self):
        target = four_mode_mixture()
        cfg = _small_cfg(mcmc_kernel="hmc", hmc_num_integration_steps=5,
                         learning_iter=30, chunk_size=30)
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()

    @pytest.mark.slow
    def test_nuts_kernel(self):
        target = four_mode_mixture()
        cfg = _small_cfg(mcmc_kernel="nuts", nuts_max_depth=3,
                         learning_iter=20, chunk_size=20)
        run = run_mfm(target, cfg)
        assert np.isfinite(np.asarray(run.metrics["loss"])).all()

    @pytest.mark.slow
    def test_in_loop_adaptation_tunes_step(self):
        """hmc/nuts adapt step size + diagonal mass inside the training scan
        (replaces the reference's hand-set per-target step_size table,
        multi_modal.py:55,92): from a deliberately bad initial step, dual
        averaging on the ensemble-mean acceptance must recover a usable one."""
        target = four_mode_mixture()
        cfg = _small_cfg(
            mcmc_kernel="hmc", hmc_num_integration_steps=5, step_size=1e-3,
            learning_iter=80, chunk_size=80, mcmc_per_flow_steps=20.0,
            mass_refresh_every=25,
        )
        run = run_mfm(target, cfg)
        steps = np.asarray(run.metrics["step_size"])
        assert steps[-1] > 10 * cfg.step_size  # grew from the bad initial
        acc = np.asarray(run.metrics["acceptance_mean"])
        assert 0.5 < np.nanmean(acc[-20:]) <= 1.0  # near the 0.8 target

    def test_mass_refresh_fires_regardless_of_interleave(self):
        """Regression: the mass refresh counts MCMC steps via the Welford
        sample count — with mcmc_per_flow_steps=4 (period 5 divides any
        round refresh number) the old count%N rule never fired."""
        from mfm_tpu.drivers.mfm import build_mfm

        target = four_mode_mixture()
        cfg = _small_cfg(
            mcmc_kernel="hmc", hmc_num_integration_steps=3,
            mcmc_per_flow_steps=4.0, mass_refresh_every=10,
            learning_iter=60, num_chain=32,
        )
        key = jax.random.PRNGKey(0)
        pieces = build_mfm(target, cfg, key)
        step_fn, init_fn = pieces.step_fn, pieces.init_fn
        carry = jax.jit(init_fn)(target.init_positions(key, cfg.num_chain))

        @jax.jit
        def run(carry):
            keys = jax.random.split(jax.random.PRNGKey(1), 60)
            counts = jnp.arange(1, 61)
            return jax.lax.scan(step_fn, carry, (keys, counts))[0]

        final = run(carry)
        # after >= 10 MCMC steps the inverse mass must have been refreshed
        # away from the identity initialization
        assert not np.allclose(np.asarray(final.inv_mass), 1.0)
        # and the Welford accumulator was reset at the refresh boundary
        assert float(final.wf.count) < 10 * cfg.num_chain

    @pytest.mark.slow  # full driver run; the default itself is unit-tested
    def test_mala_keeps_fixed_step_by_default(self):
        """MALA preserves strict reference parity: no adaptation state, the
        configured step size is used verbatim."""
        target = four_mode_mixture()
        cfg = _small_cfg(learning_iter=20, chunk_size=20)
        astep, amass, _ = cfg.resolved_adaptation()
        assert not astep and not amass
        run = run_mfm(target, cfg)
        assert "step_size" not in run.metrics

    @pytest.mark.slow
    def test_mala_opt_in_adaptation(self):
        """adapt_step_size=True opts MALA into dual averaging at the 0.574
        optimal-acceptance target."""
        target = four_mode_mixture()
        cfg = _small_cfg(
            adapt_step_size=True, step_size=5.0, learning_iter=60,
            chunk_size=60, mcmc_per_flow_steps=20.0,
        )
        run = run_mfm(target, cfg)
        steps = np.asarray(run.metrics["step_size"])
        assert steps[-1] < 2.5  # shrank from the absurd initial step


class TestMultiSeed:
    @pytest.mark.slow
    def test_vmapped_seed_sweep(self):
        from mfm_tpu.drivers import run_mfm_seeds

        target = four_mode_mixture()
        cfg = _small_cfg(learning_iter=40, chunk_size=40, num_chain=32,
                         hidden_x=(16,), hidden_t=(16,), hidden_xt=(16,),
                         fourier_dim=8, ode_steps=6)
        sweep = run_mfm_seeds(target, cfg, [0, 1, 2])
        assert sweep.positions.shape == (3, 32, 2)
        assert np.isfinite(np.asarray(sweep.metrics["loss"])).all()
        assert np.asarray(sweep.beta).min() > 0
        # seeds must differ end to end
        assert not np.allclose(
            np.asarray(sweep.positions[0]), np.asarray(sweep.positions[1])
        )
        assert not np.allclose(
            np.asarray(sweep.fourier[0]), np.asarray(sweep.fourier[1])
        )


class TestAdaptationFreeze:
    def test_step_pinned_after_freeze(self):
        """With adapt_freeze_fraction=0.5 the reported (and used) step size
        must be constant over the frozen half; with 1.0 it keeps moving to
        the very end (round-2 always-adapting behavior)."""
        from mfm_tpu.config import MFMConfig
        from mfm_tpu.drivers import run_mfm
        from mfm_tpu.targets import four_mode_mixture

        target = four_mode_mixture()
        base = dict(
            example="4-mode", dim=2, num_chain=16, learning_iter=40,
            chunk_size=40, hidden_x=(16,), hidden_t=(16,), hidden_xt=(16,),
            fourier_dim=8, ode_steps=4, mcmc_per_flow_steps=1000.0,
            mcmc_kernel="nuts", nuts_max_depth=3,
        )
        frozen = run_mfm(
            target, MFMConfig(**base, adapt_freeze_fraction=0.5),
            key=jax.random.PRNGKey(0),
        )
        steps = np.asarray(frozen.metrics["step_size"])
        # all iterations are MCMC (ratio 1000); the frozen half is constant
        assert np.unique(steps[21:]).size == 1, steps[18:]
        assert np.unique(steps[:20]).size > 1

        live = run_mfm(
            target, MFMConfig(**base, adapt_freeze_fraction=1.0),
            key=jax.random.PRNGKey(0),
        )
        live_steps = np.asarray(live.metrics["step_size"])
        assert np.unique(live_steps[21:]).size > 1  # still adapting


class TestResumeAtCompletion:
    def test_rerun_after_finished_checkpoint(self, tmp_path):
        """Re-invoking a run whose latest checkpoint is at learning_iter
        must return the completed state instead of crashing on the empty
        metrics concatenation."""
        from mfm_tpu.config import MFMConfig
        from mfm_tpu.drivers import run_mfm
        from mfm_tpu.targets import four_mode_mixture

        target = four_mode_mixture()
        cfg = MFMConfig(
            example="4-mode", dim=2, num_chain=16, learning_iter=8,
            chunk_size=4, hidden_x=(16,), hidden_t=(16,), hidden_xt=(16,),
            fourier_dim=8, ode_steps=4, mcmc_per_flow_steps=2.0,
            checkpoint_dir=str(tmp_path / "ck"), checkpoint_every_chunks=1,
        )
        first = run_mfm(target, cfg, key=jax.random.PRNGKey(0))
        again = run_mfm(target, cfg, key=jax.random.PRNGKey(0))
        assert again.metrics == {}
        np.testing.assert_array_equal(
            np.asarray(first.chain.position), np.asarray(again.chain.position)
        )

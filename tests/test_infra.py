"""Infrastructure: CLI smoke run, checkpoint save/restore + resume,
MetricLogger, plots."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mfm_tpu.config import MFMConfig, preset
from mfm_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from mfm_tpu.utils.logging import MetricLogger


class TestConfig:
    def test_presets_match_reference_overrides(self):
        pf = preset("phi-four")
        assert pf.dim == 64 and pf.num_chain == 1024 and pf.step_size == 1e-4
        pines = preset("pines")
        assert pines.dim == 1600 and pines.hidden_x == (1024, 1024)
        assert pines.score_clip == 1.0  # dim > 128 activates score clipping
        fm = preset("4-mode")
        assert fm.score_clip is None
        with pytest.raises(ValueError):
            preset("nope")
        with pytest.raises(ValueError):
            preset("4-mode", not_a_field=1)

    def test_interleave_rule(self):
        from mfm_tpu.drivers.mfm import _interleave_is_flow

        # ratio 10: flow step every 11th iteration
        flows = [bool(_interleave_is_flow(c, 10.0)) for c in range(1, 23)]
        assert sum(flows) == 2 and flows[10] and flows[21]
        # ratio 0.5: one MALA step every 3rd iteration, rest flow
        malas = [not _interleave_is_flow(c, 0.5) for c in range(1, 13)]
        assert sum(malas) == 4


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {
            "a": jnp.arange(5, dtype=jnp.float32),
            "b": (jnp.ones((2, 2)), jnp.asarray(3)),
        }
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, 7, jax.device_get(state))
        assert latest_step(d) == 7
        restored, step = restore_checkpoint(d, template=state)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(5))

    @pytest.mark.slow
    def test_mfm_resume(self, tmp_path):
        """Interrupted run + resume lands near a straight-through run."""
        from mfm_tpu.drivers import run_mfm
        from mfm_tpu.targets import four_mode_mixture

        target = four_mode_mixture()
        common = dict(
            example="4-mode", dim=2, num_chain=16, learning_iter=20,
            hidden_x=(8,), hidden_t=(8,), hidden_xt=(8,), fourier_dim=4,
            ode_steps=4, chunk_size=10,
        )
        d = str(tmp_path / "run_ckpt")
        # phase 1: run 10 iters (1 chunk) with checkpointing, stop
        cfg1 = MFMConfig(**common, checkpoint_dir=d, checkpoint_every_chunks=1)
        cfg1.learning_iter = 10
        run_mfm(target, cfg1)
        assert latest_step(d) == 10
        # phase 2: full-length config resumes from step 10
        cfg2 = MFMConfig(**common, checkpoint_dir=d, checkpoint_every_chunks=0)
        run2 = run_mfm(target, cfg2)
        assert np.isfinite(np.asarray(run2.metrics["loss"])).all()
        # only the remaining chunk was executed
        assert np.asarray(run2.metrics["loss"]).shape[0] == 10


class TestLogger:
    def test_jsonl_backend(self, tmp_path):
        log = MetricLogger(run_dir=str(tmp_path), run_name="t")
        log.log({"loss": 1.5, "iter": 1})
        log.summary({"final": 2.0})
        log.finish()
        lines = [
            json.loads(line)
            for line in open(tmp_path / "t.jsonl")
        ]
        assert lines[0]["loss"] == 1.5
        assert lines[1]["_summary"] and lines[1]["final"] == 2.0

    def test_no_dir_is_fine(self):
        log = MetricLogger()
        log.log({"x": 1})
        log.finish()


class TestPlots:
    def test_pair_scatter_and_contours(self, key):
        from mfm_tpu.drivers.plots import pair_scatter, save_figs
        from mfm_tpu.targets import four_mode_mixture

        target = four_mode_mixture()
        xs = target.sample(key, (100,))
        figs = pair_scatter(
            xs, xs, lim=(-16, 16), log_prob_fn=target.log_prob, grid_width=40,
            levels=10,
        )
        assert len(figs) == 1

    def test_phi_four_fields(self, key):
        from mfm_tpu.drivers.plots import phi_four_fields

        xs = jax.random.normal(key, (20, 16))
        fig = phi_four_fields(xs, xs)
        assert fig is not None


class TestCLI:
    @pytest.mark.slow
    def test_smoke(self, tmp_path, capsys, monkeypatch):
        """Tiny single-seed CLI run end-to-end."""
        from mfm_tpu import cli

        monkeypatch.chdir(tmp_path)
        cli.main(
            [
                "--example", "4-mode", "--seed", "0",
                "--learning-iter", "30", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "15",
                "--run-dir", str(tmp_path / "runs"),
            ]
        )
        out = capsys.readouterr().out
        assert "logprob" in out and "\\pm" in out

    @pytest.mark.slow
    def test_set_override_and_move_correct(self, tmp_path, capsys, monkeypatch):
        """--set reaches arbitrary config fields; --move-correct swaps the
        * columns to the MCMC-move-corrected set."""
        from mfm_tpu import cli

        monkeypatch.chdir(tmp_path)
        cli.main(
            [
                "--example", "4-mode", "--seed", "0",
                "--learning-iter", "20", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "20",
                "--run-dir", str(tmp_path / "runs"),
                "--set", "fourier_dim=8",
                "--set", "hidden_x=(16,)",
                "--move-correct", "5",
            ]
        )
        out = capsys.readouterr().out
        assert "logprob" in out and "\\pm" in out

    def test_set_rejects_unknown_field(self):
        from mfm_tpu import cli

        with pytest.raises(SystemExit, match="unknown config field"):
            cli.main(["--example", "4-mode", "--set", "not_a_field=1"])

    @pytest.mark.slow
    def test_plots_and_full_metrics(self, tmp_path, capsys, monkeypatch):
        """--plots leaves the reference figure set as PNGs in the run dir
        (VERDICT r3 missing item 2); --full-metrics dumps one JSONL record
        per training iteration (missing item 3)."""
        import glob
        import json as _json

        from mfm_tpu import cli

        monkeypatch.chdir(tmp_path)
        run_dir = tmp_path / "runs"
        cli.main(
            [
                "--example", "4-mode", "--seed", "0",
                "--learning-iter", "20", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "10",
                "--run-dir", str(run_dir),
                "--plots", "--full-metrics",
            ]
        )
        pngs = glob.glob(str(run_dir / "*figs*" / "*.png"))
        names = {p.rsplit("/", 1)[-1] for p in pngs}
        # 2-D target: one pair scatter + the 5-snapshot progression
        assert any(n.startswith("pairs") for n in names), names
        assert any(n.startswith("progression") for n in names), names
        jsonl = (run_dir / "4-mode-seed0.jsonl").read_text().splitlines()
        iters = [
            _json.loads(line) for line in jsonl
            if "loss" in line and "iter" in line
        ]
        per_iter = [r for r in iters if r.get("iter") and "_t" not in r]
        assert len(per_iter) == 20, len(per_iter)  # one per iteration

    def test_set_parses_shell_booleans(self):
        """'false'/'true'/'none' must become Python values, not truthy
        strings (code-review finding: --set hutchinson=false silently
        ENABLED the feature before)."""
        import mfm_tpu.cli as cli_mod
        from mfm_tpu.config import MFMConfig

        captured = {}

        def fake_preset(example, **overrides):
            captured.update(overrides)
            raise SystemExit("stop-after-parse")

        orig = cli_mod.preset
        cli_mod.preset = fake_preset
        try:
            with pytest.raises(SystemExit, match="stop-after-parse"):
                cli_mod.main([
                    "--example", "4-mode",
                    "--set", "hutchinson=false",
                    "--set", "adapt_step_size=TRUE",
                    "--set", "eval_ode_steps=none",
                    "--set", "ref_dist=prior",
                ])
        finally:
            cli_mod.preset = orig
        assert captured["hutchinson"] is False
        assert captured["adapt_step_size"] is True
        assert captured["eval_ode_steps"] is None
        assert captured["ref_dist"] == "prior"

    def test_conflicting_flags_rejected(self):
        """Flag combinations that would silently produce the wrong sampler
        must error out (code-review findings)."""
        from mfm_tpu import cli

        with pytest.raises(SystemExit, match="vmap-seeds only applies"):
            cli.main(["--example", "4-mode", "--vmap-seeds", "--do-flowmc"])
        with pytest.raises(SystemExit, match="move-correct applies only"):
            cli.main(["--example", "4-mode", "--do-smc", "--move-correct", "5"])
        with pytest.raises(SystemExit, match="move-correct applies only"):
            cli.main(["--example", "4-mode", "--vmap-seeds", "--move-correct", "5"])

    @pytest.mark.slow
    def test_smc_smoke(self, tmp_path, capsys):
        from mfm_tpu import cli

        cli.main(
            [
                "--example", "4-mode", "--seed", "0", "--do-smc",
                "--learning-iter", "10", "--num-chain", "64",
                "--run-dir", str(tmp_path / "runs"),
            ]
        )
        out = capsys.readouterr().out
        assert "SMC" in out

    def test_baseline_flag_dispatches(self, monkeypatch, tmp_path, capsys):
        """--do-fab must reach drivers.baselines.run_baseline (which falls
        back to the in-repo FAB when fabjax is absent) instead of erroring
        out. The dispatch itself is stubbed: the live loops are covered by
        test_fab/test_flowmc/test_dds."""
        import numpy as np

        from mfm_tpu import cli
        from mfm_tpu.drivers import baselines as B

        seen = {}

        def fake_run_baseline(name, target, cfg, seed=0, **kwargs):
            seen["name"] = name
            n = kwargs.get("n_eval") or 64
            samples = np.zeros((n, target.dim))
            return B.BaselineResult(samples, samples, 0.0, {})

        monkeypatch.setattr(B, "run_baseline", fake_run_baseline)
        cli.main([
            "--example", "4-mode", "--seed", "0", "--do-fab",
            "--set", "eval_iter=1", "--num-chain", "8",
            "--run-dir", str(tmp_path / "runs"),
        ])
        capsys.readouterr()
        assert seen["name"] == "fab"


class TestCLIVmapSeeds:
    @pytest.mark.slow
    def test_vmap_seeds_smoke(self, tmp_path, capsys):
        from mfm_tpu import cli

        cli.main(
            [
                "--example", "4-mode", "--vmap-seeds",
                "--learning-iter", "20", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "20",
                "--run-dir", str(tmp_path / "runs"),
            ]
        )
        out = capsys.readouterr().out
        assert "logprob" in out


class TestPackaging:
    """pyproject.toml stays consistent with the package it ships."""

    def test_entry_point_and_version(self):
        import importlib
        import pathlib
        import tomllib

        root = pathlib.Path(__file__).resolve().parents[1]
        meta = tomllib.loads((root / "pyproject.toml").read_text())
        proj = meta["project"]

        import mfm_tpu

        assert proj["version"] == mfm_tpu.__version__
        # the console script must resolve to a callable
        target = proj["scripts"]["mfm-tpu"]
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name))
        # the pines dataset ships with the wheel
        pat = meta["tool"]["setuptools"]["package-data"]["mfm_tpu.targets"]
        assert pat == ["data/*.csv"]
        assert (root / "mfm_tpu" / "targets" / "data" / "finpines.csv").exists()


class TestNewExamplesCLI:
    """funnel / many-well as first-class --example values (beyond the
    reference's four; it reaches these targets only through fabjax configs)."""

    @pytest.mark.slow
    @pytest.mark.parametrize("example", ["funnel", "many-well"])
    def test_smoke(self, example, tmp_path, capsys, monkeypatch):
        from mfm_tpu import cli

        monkeypatch.chdir(tmp_path)
        cli.main(
            [
                "--example", example, "--seed", "0",
                "--learning-iter", "30", "--num-chain", "16",
                "--ode-steps", "4", "--chunk-size", "15",
                "--run-dir", str(tmp_path / "runs"),
                "--set", "fourier_dim=8",
                "--set", "hidden_x=(16,)",
            ]
        )
        out = capsys.readouterr().out
        assert "logprob" in out and "\\pm" in out


class TestHostChunkedScan:
    """host_chunked_scan must be bit-identical to one lax.scan call — it
    exists purely to bound single-XLA-execution length (WEDGE_LOG.jsonl)."""

    def _fn(self):
        @jax.jit
        def f(carry, keys):
            def body(c, k):
                c = c + jax.random.normal(k, c.shape)
                return c, (c.sum(), c.min())

            return jax.lax.scan(body, carry, keys)

        return f

    @pytest.mark.parametrize("chunk", [1, 3, 7, 100])
    def test_matches_single_scan(self, chunk):
        from mfm_tpu.utils.pytree import host_chunked_scan

        f = self._fn()
        carry0 = jnp.zeros(4)
        keys = jax.random.split(jax.random.PRNGKey(0), 7)
        ref_carry, ref_ys = f(carry0, keys)
        carry, ys = host_chunked_scan(f, carry0, keys, chunk=chunk)
        assert jnp.array_equal(carry, ref_carry)
        for a, b in zip(ys, ref_ys):
            assert jnp.array_equal(a, b)

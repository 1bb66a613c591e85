"""Typed configuration for MFM training runs.

Single source of truth replacing the reference's ~40 argparse flags
(/root/reference/multi_modal.py:148-219) and its per-example programmatic
overrides (:23-98). The CLI (mfm_tpu.cli) and YAML front-ends construct this
dataclass; drivers consume only this.
"""

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass
class MFMConfig:
    # problem
    example: str = "4-mode"
    dim: int = 2
    seed: int = 0

    # flow architecture (reference multi_modal.py:156-180)
    hidden_x: Sequence[int] = (128, 128)
    hidden_t: Sequence[int] = (128, 128)
    hidden_xt: Sequence[int] = (128, 128)
    fourier_dim: int = 128
    fourier_std: float = 1.0
    non_linearity: str = "relu"
    grad_clip_score: float = 1.0  # applied to the score gate when dim > 128
    # None = the reference's dim > 128 rule; True/False forces the score-gate
    # clip on/off. Targets with exploding scores at any dim (Neal's funnel:
    # |d/dx log p| ~ exp(-v) in the neck) need True or tail latents diverge
    # through the transport.
    clip_score: Optional[bool] = None
    # fused weight-resident Pallas apply for the CNF transport (mid-size
    # fields whose weights fit VMEM; relu/tanh). Falls back to XLA when the
    # guard fails, or when field_precision != 'highest' (the kernel computes
    # in exact f32, which would diverge from a bf16-trained field). See
    # ops/field_pallas.py.
    pallas_field: bool = False

    # flow matching (reference multi_modal.py:155-167)
    sigma: float = 1e-4
    ref_dist: str = "stdgauss"
    cond_flow: bool = True
    ot_cond_flow: bool = False

    # CNF transport
    hutchinson: bool = False
    # None derives the estimator from ``hutchinson``; or force one of
    # 'exact' | 'hutchinson' | 'exact_disc'. 'exact_disc' uses the exact
    # log-Jacobian of the DISCRETE integrator map (flows/cnf.py), removing
    # the O(h^p) continuous-vs-discrete logdet bias that tilts IS weights
    # and the flow-SMC log-normalizer (measured -1.2 nats on the d=32
    # many-well at 24 RK4 steps); small-d only — it materializes a
    # (B, d, d) Jacobian.
    divergence_mode: Optional[str] = None
    ode_steps: int = 24
    ode_method: str = "rk4"
    field_precision: str = "highest"  # 'default' = bf16 MXU (2x less HBM traffic)
    # evaluation-time transport overrides (final sampling + IS correction).
    # IS weights exponentiate the Hutchinson logdet noise, so more/better
    # probes at eval time directly raise the IS effective sample size at
    # high dim; training keeps the cheap single-probe estimator.
    eval_hutchinson_probes: int = 1
    eval_probe_dist: str = "gaussian"  # or 'rademacher' (lower variance)
    eval_ode_steps: Optional[int] = None  # None = same as ode_steps

    # interleaving & kernels (reference multi_modal.py:167-172)
    num_importance_samples: int = 0  # >0 CIS, <0 indep-MH, 0 pullback-RWM
    mcmc_per_flow_steps: float = 10.0  # <0 trains on exact target samples
    num_chain: int = 128
    step_size: float = 0.2
    mcmc_kernel: str = "mala"  # mala | hmc | nuts (reference hardcodes MALA)
    hmc_num_integration_steps: int = 10
    nuts_max_depth: int = 6
    nuts_variant: str = "auto"  # auto | static | iterative (see kernels/nuts)
    # in-loop MCMC adaptation (new capability — replaces the reference's
    # hand-set per-target step_size table, multi_modal.py:55,92). None = auto:
    # on for hmc/nuts, off for mala (strict reference parity for MALA runs).
    adapt_step_size: Optional[bool] = None
    adapt_mass: Optional[bool] = None  # diagonal inverse mass (hmc/nuts only)
    da_target_acceptance: Optional[float] = None  # auto: 0.8 hmc/nuts, 0.574 mala
    mass_refresh_every: int = 100  # window length for Welford mass refreshes
    # freeze in-loop adaptation after this fraction of learning_iter: the
    # rest of the run uses the dual-averaged step size and the last mass
    # estimate (continuous adaptation through the END of training left
    # the final-window chain quality at the mercy of the last re-anchor —
    # the round-2 NUTS seed-variance source; RESULTS.md round 3). 1.0
    # reproduces the round-2 always-adapting behavior.
    adapt_freeze_fraction: float = 0.6
    learning_iter: int = 400
    eval_iter: int = 100

    # adaptive tempering (reference multi_modal.py:173-175)
    alpha: float = 0.95
    anneal_iter: int = 200
    num_anneal_temp: int = 200
    # flowMC baseline: coupling-flow depth. None = the reference's own
    # derivation n_layers = len(hidden_x) + len(hidden_t) + 4
    # (exe_others.py:132); set explicitly to decouple flow depth from the
    # MFM field's MLP config.
    flowmc_n_layers: Optional[int] = None

    # SMC tempering path. "reference" keeps the reference convention
    # (pi_beta ∝ exp(beta*log_lik + log_prior), exe_flow_matching.py:301)
    # — but for flat-prior targets (the mixtures, many-well, phi-four:
    # log_prior ≡ 0) the beta=0 endpoint is improper while particles
    # initialize from N(0, I), so the logZ telescope picks up a spurious
    # first term log E_{N(0,I)}[exp(delta_1*log_lik)] (measured: -14.5
    # nats on 4-mode whose true logZ is 0; RESULTS.md round 5).
    # "geometric" wraps the target as targets.base.GeometricPath —
    # pi_beta ∝ N(0,I)^(1-beta) * p^beta — whose beta=0 endpoint IS the
    # init distribution, making log_z a valid estimate of the target's
    # log-normalizer. Samples at beta=1 target p either way; only the
    # anneal route and the logZ meaning change. Proper-prior targets
    # (pines) should keep "reference": their prior anneal is already
    # valid and better-conditioned than an N(0,I) bridge.
    smc_path: str = "reference"  # reference | geometric

    # waste-free SMC (Dau & Chopin 2022) for the SMC drivers: resample
    # M = num_chain / P ancestors per tempering step and keep all P chain
    # states per ancestor as the new particle system (reference declares
    # the num_resampled hook, bblackjax/smc/base.py:99-103, but never
    # uses it). 0 = standard SMC (iter_per_temp inner moves, last state
    # kept); P >= 2 replaces the per-step move budget with P - 1.
    waste_free_p: int = 0

    # optimizer (reference multi_modal.py:199-205)
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    gradient_clip: float = 1.0
    warmup_steps: int = 0

    # execution
    chunk_size: int = 100  # scan steps per device round-trip
    mesh_shape: Optional[Tuple[int, ...]] = None  # (ensemble, chains) or None
    checkpoint_dir: Optional[str] = None
    checkpoint_every_chunks: int = 0  # 0 disables

    # plotting / misc (reference multi_modal.py:214-217)
    lim: Optional[Sequence[float]] = (-16.0, 16.0)
    grid_width: int = 400
    levels: int = 50

    def __post_init__(self):
        # fail at construction (dataclass, YAML, CLI --set) rather than at
        # first transport build
        allowed = (None, "exact", "hutchinson", "exact_disc")
        if self.divergence_mode not in allowed:
            raise ValueError(
                f"divergence_mode={self.divergence_mode!r} not in "
                f"{allowed[1:]}"
            )

    @property
    def iter_per_temp(self) -> int:
        return max(self.anneal_iter // self.num_anneal_temp, 1)

    @property
    def score_clip(self) -> Optional[float]:
        """Score-gate clipping activates above dim 128 (reference
        exe_flow_matching.py:351) unless ``clip_score`` forces it."""
        on = self.dim > 128 if self.clip_score is None else self.clip_score
        return self.grad_clip_score if on else None

    @property
    def divergence(self) -> str:
        if self.divergence_mode is not None:  # validated in __post_init__
            return self.divergence_mode
        return "hutchinson" if self.hutchinson else "exact"

    def resolved_adaptation(self) -> Tuple[bool, bool, float]:
        """(adapt_step_size, adapt_mass, target_acceptance) with None fields
        resolved: gradient-trajectory kernels (hmc/nuts) adapt by default;
        MALA keeps the reference's fixed step size unless asked. Target
        acceptance defaults: 0.8 (hmc/nuts, Stan), 0.574 (MALA optimal)."""
        grad_traj = self.mcmc_kernel in ("hmc", "nuts")
        astep = grad_traj if self.adapt_step_size is None else self.adapt_step_size
        if self.adapt_mass and not grad_traj:
            raise ValueError(
                "adapt_mass=True requires a trajectory kernel (hmc/nuts); "
                f"mcmc_kernel={self.mcmc_kernel!r} has no mass matrix"
            )
        amass = (
            (grad_traj and astep) if self.adapt_mass is None else self.adapt_mass
        )
        tacc = self.da_target_acceptance
        if tacc is None:
            tacc = 0.8 if grad_traj else 0.574
        return astep, amass and grad_traj, tacc


def preset(example: str, **overrides) -> MFMConfig:
    """Per-example hyperparameters (reference multi_modal.py:23-98)."""
    cfg = MFMConfig(example=example)
    if example == "4-mode":
        cfg.dim = 2
        cfg.step_size = 0.2
        cfg.lim = (-16.0, 16.0)
        cfg.levels = 20
        cfg.learning_iter = 1000
    elif example == "gaussian-mixture":
        cfg.dim = 2
        cfg.step_size = 0.2
        cfg.lim = (-16.0, 16.0)
        cfg.levels = 20
        cfg.learning_iter = 10_000
    elif example == "phi-four":
        cfg.dim = 64
        cfg.num_chain = 1024
        cfg.eval_iter = 1
        cfg.step_size = 1e-4
        cfg.lim = (-1.6, 1.6)
        cfg.learning_iter = 10_000
        cfg.chunk_size = 1000
        # bf16-multiply/f32-accumulate field: full 10k-iter run 11.0 s vs
        # 26.2 s f32-exact with equal-or-better KSD (RESULTS.md round 3 —
        # overturns the round-2 "11x slower" entry, which no longer
        # reproduces; per-component dissection there). --set
        # field_precision=highest restores exact-f32 matmuls.
        cfg.field_precision = "default"
    elif example == "pines":
        cfg.dim = 1600
        cfg.num_chain = 128
        cfg.eval_iter = 1
        cfg.step_size = 0.01
        cfg.hidden_x = cfg.hidden_t = cfg.hidden_xt = (1024, 1024)
        cfg.lim = None
        cfg.learning_iter = 10_000
        cfg.chunk_size = 1000
        cfg.hutchinson = True  # exact trace is O(d) MLP passes at d=1600
        # informed reference: prior -> posterior transport beats stdgauss on
        # every pines metric (RESULTS.md); pass ref_dist='stdgauss' for
        # strict reference parity
        cfg.ref_dist = "prior"
        # bf16-multiply/f32-accumulate field: 2.5x faster 10k-iter training
        # with statistically identical quality (RESULTS.md round 2:
        # KSD-U 0.081 vs 0.088, same logpdf/acceptance). The flow-MH
        # correction stays exact against the bf16-defined flow since forward
        # and inverse use the identical function. --set
        # field_precision=highest restores exact-f32 matmuls.
        cfg.field_precision = "default"
        # Rademacher eval probes: at d=1600 the 1-probe *Gaussian*
        # Hutchinson logdet carries ~6.6 nats of per-sample noise, which
        # Jensen-tilts any exponentiated use of the logdet (measured:
        # flow-SMC logZ biased +1.8 nats vs the converged plain-SMC
        # estimate; RESULTS_raw_pines_logz_probe_bias.json). Rademacher
        # probes zero the diagonal variance term and recover the unbiased
        # answer at identical cost.
        cfg.eval_probe_dist = "rademacher"
    elif example == "funnel":
        # beyond-reference example: the reference reaches Neal's funnel only
        # through the fabjax baseline configs (config/funnel.yaml); here it
        # runs the full MFM pipeline. dim/sigma follow the FAB setup.
        cfg.dim = 10
        cfg.step_size = 0.1
        cfg.lim = (-8.0, 8.0)
        cfg.learning_iter = 2000
        # the funnel score explodes like exp(-v) in the neck at any dim;
        # unclipped, tail latents diverge through the transport at eval
        cfg.clip_score = True
    elif example == "many-well":
        # beyond-reference example (reference config/many_well.yaml is
        # fabjax-only). dim=32 = 16 double-well pairs, 2^16 modes.
        cfg.dim = 32
        cfg.step_size = 0.02
        cfg.lim = (-3.0, 3.0)
        cfg.learning_iter = 2000
    else:
        raise ValueError(f"unknown example {example!r}")
    for k, v in overrides.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown config field {k!r}")
        setattr(cfg, k, v)
    cfg.__post_init__()  # overrides bypass dataclass init; re-validate
    return cfg


def from_yaml(path: str, **overrides) -> MFMConfig:
    """Load a config from YAML (the reference's second config tier uses
    hydra YAML composition for the FAB baseline, config/*.yaml;
    exe_others.py:58-59 — here one flat YAML with an optional ``include``
    chain and an optional ``example`` preset base).

    Resolution order: preset(example) if given -> included file(s) ->
    this file's fields -> keyword overrides.
    """
    import os

    import yaml

    def collect(p):
        """Depth-first: included files contribute only their explicit fields."""
        with open(p) as fh:
            raw = dict(yaml.safe_load(fh) or {})
        include = raw.pop("include", None)
        fields = {}
        if include is not None:
            fields.update(collect(os.path.join(os.path.dirname(p), include)))
        fields.update(raw)
        return fields

    merged = {**collect(path), **overrides}
    example = merged.pop("example", None)
    cfg = preset(example) if example is not None else MFMConfig()
    for k, v in merged.items():
        if not hasattr(cfg, k):
            raise ValueError(f"unknown config field {k!r} in {path}")
        if isinstance(getattr(cfg, k), tuple) and isinstance(v, list):
            v = tuple(v)
        setattr(cfg, k, v)
    cfg.__post_init__()  # overrides bypass dataclass init; re-validate
    return cfg

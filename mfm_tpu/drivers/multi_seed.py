"""Vectorized multi-seed MFM replication.

The reference replicates every benchmark over 10 seeds with a host loop
(multi_modal.py:118-131), paying full compile + run time per seed. On TPU
the seeds are embarrassingly parallel *within one program*: this driver
vmaps the entire training run — per-seed network init (including per-seed
Fourier features), chain states, tempering levels and optimizer states —
so the whole replication is one scanned, jitted computation whose batched
GEMMs fill the MXU far better than any single small-seed run.

Design notes:
- the interleave decision depends only on the shared step counter, so the
  flow/MALA ``lax.cond`` stays a real branch under vmap (predicate is
  unbatched); only the cheap tempering update degrades to a select.
- per-seed Fourier frequencies live as traced module attributes constructed
  inside the vmapped trace (parity with the reference's per-seed
  key_fourier draw, exe_flow_matching.py:333,350).
"""

import time
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from mfm_tpu.config import MFMConfig
from mfm_tpu.flows import (
    FlowTarget,
    NON_LINEARITIES,
    VectorFieldNet,
    apply_gradients,
    create_train_state,
    flow_matching_loss,
    make_lr_schedule,
    make_optimizer,
    make_transport,
    select_flow_kernel,
)
from mfm_tpu.drivers.mfm import next_beta, _interleave_is_flow
from mfm_tpu.kernels import mala
from mfm_tpu.targets import make_ref_dist
from mfm_tpu.targets.base import Target


class SeedSweep(NamedTuple):
    positions: jax.Array  # (S, n_chain, d) final chain positions
    params: dict  # per-seed flow params (leading S axis)
    fourier: jax.Array  # (S, F) per-seed frequencies
    beta: jax.Array  # (S,)
    metrics: dict  # (S, n_iter) stacked scalars
    train_time: float


def run_mfm_seeds(target: Target, cfg: MFMConfig, seeds: Sequence[int]) -> SeedSweep:
    """Run the full MFM training for every seed in one vmapped program."""
    ref_dist = make_ref_dist(cfg.ref_dist, cfg.dim)
    lr_fn = make_lr_schedule(cfg.learning_iter, cfg.warmup_steps, cfg.learning_rate)
    tx = make_optimizer(
        lr_fn,
        weight_decay=cfg.weight_decay,
        b1=cfg.adam_beta1,
        b2=cfg.adam_beta2,
        eps=cfg.adam_epsilon,
        gradient_clip=cfg.gradient_clip,
    )
    flow_kernel = select_flow_kernel(cfg.num_importance_samples)
    vs_fn = target.tempered_value_and_score
    use_real_samples = cfg.mcmc_per_flow_steps < 0
    seed_arr = jnp.asarray(list(seeds), jnp.uint32)
    counts = jnp.arange(1, cfg.learning_iter + 1)

    def single_seed(seed):
        key = jax.random.PRNGKey(seed)
        key_build, key_pos, key_loop = jax.random.split(key, 3)
        key_freq, key_init = jax.random.split(key_build)

        freqs = cfg.fourier_std * jax.random.normal(key_freq, (cfg.fourier_dim,))
        net = VectorFieldNet(
            fourier_freqs=freqs,
            hidden_x=tuple(cfg.hidden_x),
            hidden_t=tuple(cfg.hidden_t),
            hidden_xt=tuple(cfg.hidden_xt),
            act=NON_LINEARITIES[cfg.non_linearity],
            score_fn=target.score,
            score_clip=cfg.score_clip,
        )
        params = net.init(key_init, jnp.zeros((1, cfg.dim)), jnp.zeros((1,)))
        transport = make_transport(
            net.apply, divergence=cfg.divergence, n_steps=cfg.ode_steps,
            method=cfg.ode_method,
        )

        def loss_fn(p, k, samples):
            return flow_matching_loss(
                p, net.apply, k, samples, cfg.sigma, ref_sampler=ref_dist.sample,
                conditional=cfg.cond_flow, ot_coupling=cfg.ot_cond_flow,
            )

        init_positions = target.init_positions(key_pos, cfg.num_chain)
        if use_real_samples:
            beta0 = jnp.ones(())
        else:
            beta0 = next_beta(
                0.0, target.log_lik(init_positions), cfg.alpha, cfg.num_chain
            )
        chain0 = mala.init(init_positions, lambda x: vs_fn(x, beta0))
        train0 = create_train_state(params, tx)

        def step(carry, xs):
            chain, train, beta = carry
            k, count = xs
            k_gen, k_loss = jax.random.split(k)
            vs = lambda x: vs_fn(x, beta)

            if use_real_samples:
                pos = target.sample(k_gen, (cfg.num_chain,))
                chain = chain._replace(position=pos)
                acc = jnp.full(cfg.num_chain, jnp.nan)
            else:
                tgt = FlowTarget(vs, ref_dist.log_prob, ref_dist.sample)
                mcmc = mala.build_kernel(vs)

                def do_flow(kk):
                    new, info = flow_kernel(kk, chain, train.params, transport, tgt)
                    return new, info.acceptance_rate

                def do_mala(kk):
                    new, info = mcmc(kk, chain, cfg.step_size)
                    return new, info.acceptance_rate

                chain, acc = lax.cond(
                    _interleave_is_flow(count, cfg.mcmc_per_flow_steps),
                    do_flow,
                    do_mala,
                    k_gen,
                )

            loss, grads = jax.value_and_grad(loss_fn)(
                train.params, k_loss, chain.position
            )
            train = apply_gradients(train, grads, tx)

            if not use_real_samples:
                do_temper = (count % cfg.iter_per_temp == 0) & (beta < 1.0)

                def temper(args):
                    ch, b = args
                    nb = next_beta(
                        b, target.log_lik(ch.position), cfg.alpha, cfg.num_chain
                    )
                    return mala.init(ch.position, lambda x: vs_fn(x, nb)), nb

                chain, beta = lax.cond(
                    do_temper, temper, lambda a: (a[0], a[1]), (chain, beta)
                )

            metrics = {"loss": loss, "acceptance_mean": jnp.nanmean(acc), "beta": beta}
            return (chain, train, beta), metrics

        keys = jax.random.split(key_loop, cfg.learning_iter)
        (chain, train, beta), metrics = lax.scan(
            step, (chain0, train0, beta0), (keys, counts)
        )
        return chain.position, train.params, freqs, beta, metrics

    sweep = jax.jit(jax.vmap(single_seed))
    out = sweep(seed_arr)  # compile + run
    jax.block_until_ready(out)
    start = time.time()
    out = sweep(seed_arr)
    jax.block_until_ready(out)
    train_time = time.time() - start
    positions, params, fourier, beta, metrics = out
    return SeedSweep(positions, params, fourier, beta, metrics, train_time)

"""Minimal jaxopt.Bisection shim (the reference uses only
Bisection(optimality_fun, lower, upper, maxiter, tol, check_bracket).run().params).
Backed by a fixed-iteration bisection equivalent to jaxopt's."""

import jax.numpy as jnp
from jax import lax


class _Result:
    def __init__(self, params):
        self.params = params


class Bisection:
    def __init__(self, optimality_fun, lower, upper, maxiter=30, tol=1e-5,
                 check_bracket=True):
        self.fun = optimality_fun
        self.lower = lower
        self.upper = upper
        self.maxiter = maxiter

    def run(self):
        fun = self.fun
        lower = jnp.asarray(self.lower, jnp.result_type(float))
        upper = jnp.asarray(self.upper, jnp.result_type(float))
        f_upper = fun(upper)

        def body(_, ab):
            a, b = ab
            mid = 0.5 * (a + b)
            f_mid = fun(mid)
            a = jnp.where(f_mid >= 0, mid, a)
            b = jnp.where(f_mid >= 0, b, mid)
            return (a, b)

        a, b = lax.fori_loop(0, self.maxiter, body, (lower, upper))
        root = jnp.where(f_upper >= 0, upper, 0.5 * (a + b))
        return _Result(root)

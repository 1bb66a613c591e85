"""Name-only diffrax shim: the reference imports these symbols at module
level but the active code path never calls them (its diffrax branch is
commented out, exe_flow_matching.py:337-343)."""


def _unused(*args, **kwargs):
    raise NotImplementedError("diffrax shim: the reference's active path uses jax odeint")


Tsit5 = Dopri5 = Heun = Kvaerno3 = Kvaerno4 = Kvaerno5 = _unused
diffeqsolve = ODETerm = SaveAt = PIDController = _unused

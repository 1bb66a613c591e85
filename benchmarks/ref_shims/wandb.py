"""No-op wandb shim so the (unmodified, read-only) reference can run as a
baseline. Only the calls the reference makes are provided."""


class _Summary(dict):
    pass


class _Run:
    summary = _Summary()


run = _Run()


def init(*args, **kwargs):
    return run


def log(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass


class Image:
    def __init__(self, *args, **kwargs):
        pass


class Table:
    def __init__(self, *args, **kwargs):
        pass

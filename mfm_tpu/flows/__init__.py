from mfm_tpu.flows.vector_field import (
    NON_LINEARITIES,
    VectorFieldNet,
    make_vector_field,
)
from mfm_tpu.flows.ode import odeint_dopri5, odeint_grid, odeint_grid_save
from mfm_tpu.flows.cnf import (
    Transport,
    exact_divergence,
    flow_log_density,
    hutchinson_divergence,
    make_transport,
)
from mfm_tpu.flows.losses import (
    FMBatch,
    cond_fm_sample,
    flow_matching_loss,
    fm_sample,
    ot_pair,
    sinkhorn_plan,
)
from mfm_tpu.flows.train import (
    TrainState,
    apply_gradients,
    create_train_state,
    decay_mask,
    make_lr_schedule,
    make_optimizer,
)
from mfm_tpu.flows.flow_mh import (
    FlowTarget,
    cis_refresh,
    independence_mh,
    pullback_rwm,
    select_flow_kernel,
)

__all__ = [
    "NON_LINEARITIES",
    "VectorFieldNet",
    "make_vector_field",
    "odeint_dopri5",
    "odeint_grid",
    "odeint_grid_save",
    "Transport",
    "exact_divergence",
    "flow_log_density",
    "hutchinson_divergence",
    "make_transport",
    "FMBatch",
    "cond_fm_sample",
    "flow_matching_loss",
    "fm_sample",
    "ot_pair",
    "sinkhorn_plan",
    "TrainState",
    "apply_gradients",
    "create_train_state",
    "decay_mask",
    "make_lr_schedule",
    "make_optimizer",
    "FlowTarget",
    "cis_refresh",
    "independence_mh",
    "pullback_rwm",
    "select_flow_kernel",
]

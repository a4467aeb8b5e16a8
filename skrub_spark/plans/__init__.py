from .data_ops import (  # noqa: F401
    DataOp,
    NotFittedError,
    X,
    as_data_op,
    choose_bool,
    choose_float,
    choose_from,
    choose_int,
    cross_validate,
    deferred,
    eval_mode,
    optional,
    var,
    y,
    ParamSearch,
    RandomizedParamSearch,
    SkrubLearner,
)

from .audit import (  # noqa: F401
    audit_plan,
    codegen_stages,
    count_exchanges,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
)

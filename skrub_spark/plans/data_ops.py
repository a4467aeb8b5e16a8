"""DataOps-lite — capability parity with skrub/_data_ops.

The reference builds a lazy DAG of named inputs (``var``), method
calls and transformer applications, evaluated with ``.skb.eval``.
Spark DataFrames are already lazy plans, so this layer only adds the
pieces Spark lacks: named placeholder inputs, deferred Python calls,
hyperparameter choice objects, and grid search over them.

    >>> orders = var("orders")
    >>> plan = orders.filter("o_totalprice > 100").groupBy(
    ...     "o_custkey").count()
    >>> plan.skb.eval({"orders": orders_df})

PARTIAL vs reference: no optuna backend, no subsampling preview, no
train/test eval modes (cross_validate does fold splitting directly).
"""

from __future__ import annotations

import itertools


class Choice:
    """A hyperparameter choice placeholder (skrub.choose_from...)."""

    def __init__(self, outcomes, name: str | None = None, default=None):
        self.outcomes = list(outcomes)
        self.name = name
        self.default = default if default is not None else self.outcomes[0]

    def __repr__(self):
        return f"choose_from({self.outcomes!r}, name={self.name!r})"


def choose_from(outcomes, name: str | None = None):
    return Choice(list(outcomes), name)


def choose_bool(name: str | None = None):
    return Choice([True, False], name)


def choose_int(low: int, high: int, name: str | None = None, n_steps: int = 5):
    step = max(1, (high - low) // max(n_steps - 1, 1))
    vals = sorted(set(list(range(low, high + 1, step)) + [high]))
    return Choice(vals, name)


def choose_float(low: float, high: float, name: str | None = None, n_steps: int = 5):
    vals = [low + (high - low) * i / (n_steps - 1) for i in range(n_steps)]
    return Choice(vals, name)


def optional(value, name: str | None = None):
    return Choice([value, None], name)


def _resolve(obj, env, params):
    if isinstance(obj, DataOp):
        return obj._evaluate(env, params)
    if isinstance(obj, Choice):
        if obj.name and obj.name in params:
            return params[obj.name]
        return obj.default
    if isinstance(obj, (list, tuple)):
        return type(obj)(_resolve(x, env, params) for x in obj)
    if isinstance(obj, dict):
        return {k: _resolve(v, env, params) for k, v in obj.items()}
    return obj


def _collect_choices(obj, acc):
    if isinstance(obj, Choice):
        acc.append(obj)
    elif isinstance(obj, DataOp):
        obj._collect_choices(acc)
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            _collect_choices(x, acc)
    elif isinstance(obj, dict):
        for v in obj.values():
            _collect_choices(v, acc)


class _SkbNamespace:
    """``.skb`` accessor (mirrors DataOp.skb in the reference)."""

    def __init__(self, op: DataOp):
        self._op = op

    def eval(self, env: dict | None = None, params: dict | None = None):
        return self._op._evaluate(env or {}, params or {})

    def apply(self, transformer):
        """Apply a SparkTransformer: fit_transform at eval time."""

        def _apply(df, t=transformer):
            import copy

            return copy.deepcopy(t).fit_transform(df)

        return DataOp("apply", _apply, (self._op,), {})

    def describe(self) -> str:
        return self._op._describe()

    def choices(self) -> list[Choice]:
        acc: list[Choice] = []
        self._op._collect_choices(acc)
        return acc


class DataOp:
    """A node in the deferred computation DAG."""

    def __init__(self, kind, payload, args=(), kwargs=None):
        self._kind = kind  # var | literal | call | method | apply
        self._payload = payload
        self._args = tuple(args)
        self._kwargs = kwargs or {}

    # -- construction -------------------------------------------------
    def __getattr__(self, name):
        if name.startswith("_") or name == "skb":
            raise AttributeError(name)

        def method(*args, **kwargs):
            return DataOp("method", name, (self,) + args, kwargs)

        return method

    def __getitem__(self, item):
        return DataOp("method", "__getitem__", (self, item), {})

    @property
    def skb(self) -> _SkbNamespace:
        return _SkbNamespace(self)

    # -- evaluation ---------------------------------------------------
    def _evaluate(self, env: dict, params: dict):
        if self._kind == "var":
            if self._payload not in env:
                raise KeyError(
                    f"no value provided for var {self._payload!r}; "
                    f"available: {sorted(env)}"
                )
            return env[self._payload]
        if self._kind == "literal":
            return _resolve(self._payload, env, params)
        if self._kind == "method":
            obj, *rest = self._args
            target = _resolve(obj, env, params)
            args = [_resolve(a, env, params) for a in rest]
            kwargs = {k: _resolve(v, env, params) for k, v in self._kwargs.items()}
            if self._payload == "__getitem__":
                return target[args[0]]
            return getattr(target, self._payload)(*args, **kwargs)
        if self._kind in ("call", "apply"):
            args = [_resolve(a, env, params) for a in self._args]
            kwargs = {k: _resolve(v, env, params) for k, v in self._kwargs.items()}
            return self._payload(*args, **kwargs)
        raise ValueError(self._kind)

    def _collect_choices(self, acc):
        _collect_choices(self._payload if self._kind == "literal" else None, acc)
        for a in self._args:
            _collect_choices(a, acc)
        for v in self._kwargs.values():
            _collect_choices(v, acc)

    def _describe(self, depth=0) -> str:
        pad = "  " * depth
        if self._kind == "var":
            return f"{pad}var({self._payload!r})"
        if self._kind == "literal":
            return f"{pad}literal({type(self._payload).__name__})"
        name = self._payload if isinstance(self._payload, str) else getattr(
            self._payload, "__name__", "fn"
        )
        lines = [f"{pad}{self._kind}:{name}"]
        for a in self._args:
            if isinstance(a, DataOp):
                lines.append(a._describe(depth + 1))
        return "\n".join(lines)

    def __repr__(self):
        return f"<DataOp:\n{self._describe()}\n>"


def var(name: str) -> DataOp:
    return DataOp("var", name)


X = var("X")
y = var("y")


def as_data_op(value) -> DataOp:
    return DataOp("literal", value)


def deferred(fn):
    """Wrap a function so calling it builds a DataOp instead of
    executing (skrub.deferred)."""

    def wrapper(*args, **kwargs):
        return DataOp("call", fn, args, kwargs)

    wrapper.__name__ = getattr(fn, "__name__", "deferred")
    return wrapper


class SkrubLearner:
    """Evaluate a plan as a fit/predict-ish object (minimal parity
    with skrub's SkrubLearner: the plan IS the model)."""

    def __init__(self, plan: DataOp, params: dict | None = None):
        self.plan = plan
        self.params = params or {}

    def fit_transform(self, env: dict):
        return self.plan.skb.eval(env, self.params)

    transform = fit_transform


class ParamSearch:
    """Exhaustive grid search over the named choices in a plan.

    ``scorer(result) -> float`` (greater is better) runs on the
    evaluated plan output for each combination."""

    def __init__(self, plan: DataOp, scorer):
        self.plan = plan
        self.scorer = scorer

    def fit(self, env: dict):
        choices = [c for c in self.plan.skb.choices() if c.name]
        names = [c.name for c in choices]
        best_score, best_params = None, {}
        results = []
        for combo in itertools.product(*[c.outcomes for c in choices]) or [()]:
            params = dict(zip(names, combo))
            out = self.plan.skb.eval(env, params)
            score = self.scorer(out)
            results.append({"params": params, "score": score})
            if best_score is None or score > best_score:
                best_score, best_params = score, params
        self.results_ = results
        self.best_params_ = best_params
        self.best_score_ = best_score
        return self


def cross_validate(plan_fn, df, k: int = 3, scorer=None, seed: int = 42):
    """k-fold CV over a DataFrame: plan_fn(train_df, test_df) -> score
    (or pass scorer to apply to plan_fn's result)."""
    splits = df.randomSplit([1.0] * k, seed=seed)
    scores = []
    for i in range(k):
        test = splits[i]
        train = None
        for j, s in enumerate(splits):
            if j != i:
                train = s if train is None else train.union(s)
        res = plan_fn(train, test)
        scores.append(scorer(res) if scorer else res)
    return scores

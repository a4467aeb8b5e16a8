"""DataOps-lite — capability parity with skrub/_data_ops.

The reference builds a lazy DAG of named inputs (``var``), method
calls and transformer applications, evaluated with ``.skb.eval``.
Spark DataFrames are already lazy plans, so this layer only adds the
pieces Spark lacks: named placeholder inputs, deferred Python calls,
hyperparameter choice objects, grid search over them, and the
fit/transform asymmetry (reference:
skrub/_data_ops/_data_ops.py eval modes + _skrub_namespace.py).

    >>> orders = var("orders")
    >>> plan = orders.filter("o_totalprice > 100").groupBy(
    ...     "o_custkey").count()
    >>> plan.skb.eval({"orders": orders_df})

Eval modes (threaded through the whole DAG, as in the reference's
``eval_mode``):

- ``fit_transform`` (default): ``.skb.apply(t)`` nodes deep-copy the
  transformer, fit it on the incoming frame, and RECORD the fitted
  instance in the eval state.
- ``transform``: apply nodes reuse the recorded fitted instance and
  only call ``.transform`` — encoders fit on train are frozen when
  applied to test data.
- ``preview``: like fit_transform, but ``.skb.subsample(...)`` nodes
  actually subsample (they are identity passthroughs in the other
  modes), mirroring ``.skb.subsample``'s interactive-only default
  (reference: _data_ops/_skrub_namespace.py:837).

PARTIAL vs reference: no optuna backend.
"""

from __future__ import annotations

import copy
import itertools

_UID = itertools.count()


class NotFittedError(RuntimeError):
    pass


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


class _EvalCtx:
    """Evaluation context: inputs, chosen params, eval mode, fitted
    state (apply-node uid -> fitted transformer) and per-eval memo so
    a node shared by two plan branches evaluates (and fits) once."""

    def __init__(self, env, params, mode="fit_transform", state=None,
                 keep_subsampling=False):
        if mode not in ("fit_transform", "transform", "preview"):
            raise ValueError(f"unknown eval mode {mode!r}")
        self.env = env
        self.params = params
        self.mode = mode
        self.state = state if state is not None else {}
        self.keep_subsampling = keep_subsampling
        self.memo: dict[int, object] = {}


def _resolve(obj, ctx: _EvalCtx):
    if isinstance(obj, DataOp):
        return obj._evaluate(ctx)
    if isinstance(obj, Choice):
        if obj.name and obj.name in ctx.params:
            return ctx.params[obj.name]
        return obj.default
    if isinstance(obj, (list, tuple)):
        return type(obj)(_resolve(x, ctx) for x in obj)
    if isinstance(obj, dict):
        return {k: _resolve(v, ctx) for k, v in obj.items()}
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

    def eval(self, env: dict | None = None, params: dict | None = None,
             mode: str = "fit_transform", state: dict | None = None,
             keep_subsampling: bool = False):
        ctx = _EvalCtx(env or {}, params or {}, mode, state, keep_subsampling)
        return self._op._evaluate(ctx)

    def preview(self, env: dict | None = None, params: dict | None = None):
        """Evaluate with subsampling active (interactive preview)."""
        return self.eval(env, params, mode="preview")

    def apply(self, transformer, y=None):
        """Apply a SparkTransformer: fit_transform in fit mode, frozen
        .transform in transform mode (reference .skb.apply)."""
        kwargs = {} if y is None else {"y": y}
        return DataOp("apply", transformer, (self._op,), kwargs)

    def subsample(self, n: int = 1000, how: str = "head", seed: int = 0):
        """Subsampling marker: active only in preview mode (or when
        eval(keep_subsampling=True)); identity otherwise.
        how='head' -> limit(n); how='random' -> seeded sample."""
        if how not in ("head", "random"):
            raise ValueError("how must be 'head' or 'random'")
        return DataOp("subsample", (int(n), how, int(seed)), (self._op,), {})

    def make_learner(self, params: dict | None = None) -> "SkrubLearner":
        return SkrubLearner(self._op, params)

    def describe(self) -> str:
        return self._op._describe()

    def choices(self) -> list[Choice]:
        acc: list[Choice] = []
        self._op._collect_choices(acc)
        return acc

    def draw_graph(self) -> str:
        """Graphviz DOT source for the plan DAG (reference
        ``.skb.draw_graph``, skrub/_data_ops/_inspection.py — the
        reference renders SVG via pydot; this environment has no
        graphviz, so the DOT text itself is the artifact: every node
        labeled kind:name, every data dependency an edge, shared
        subplans appearing once). Paste into any DOT renderer."""
        nodes: dict[int, str] = {}
        edges: list[tuple[int, int]] = []
        self._op._collect_graph(nodes, edges, set())
        lines = ["digraph dataops_plan {", "  rankdir=TB;"]
        for uid, label in nodes.items():
            esc = label.replace('"', '\\"')
            shape = "oval" if label.startswith("var(") else "box"
            lines.append(f'  n{uid} [label="{esc}", shape={shape}];')
        for a, b in edges:
            lines.append(f"  n{a} -> n{b};")
        lines.append("}")
        return "\n".join(lines)

    def full_report(self) -> dict:
        """Structured plan report (reference ``.skb.full_report``
        without the HTML shell): per-node kind/name/argument counts
        in topological (dependency-first) order, plus the plan's
        declared variables and hyperparameter choices. JSON-able."""
        nodes: dict[int, str] = {}
        edges: list[tuple[int, int]] = []
        order: list[DataOp] = []
        self._op._collect_graph(nodes, edges, set(), order)
        return {
            "n_nodes": len(nodes),
            "nodes": [
                {
                    "uid": op._uid,
                    "kind": op._kind,
                    "label": nodes[op._uid],
                    "n_inputs": sum(
                        1 for a in op._args if isinstance(a, DataOp)
                    ),
                }
                for op in order
            ],
            "vars": sorted(
                {
                    op._payload
                    for op in order
                    if op._kind == "var"
                }
            ),
            "choices": [
                {"name": c.name, "outcomes": list(c.outcomes)}
                for c in self.choices()
            ],
        }


class DataOp:
    """A node in the deferred computation DAG."""

    def __init__(self, kind, payload, args=(), kwargs=None):
        self._kind = kind  # var | literal | call | method | apply | subsample
        self._payload = payload
        self._args = tuple(args)
        self._kwargs = kwargs or {}
        self._uid = next(_UID)

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
    def _evaluate(self, ctx: _EvalCtx):
        if self._uid in ctx.memo:
            return ctx.memo[self._uid]
        out = self._evaluate_inner(ctx)
        ctx.memo[self._uid] = out
        return out

    def _evaluate_inner(self, ctx: _EvalCtx):
        if self._kind == "var":
            if self._payload not in ctx.env:
                raise KeyError(
                    f"no value provided for var {self._payload!r}; "
                    f"available: {sorted(ctx.env)}"
                )
            return ctx.env[self._payload]
        if self._kind == "literal":
            return _resolve(self._payload, ctx)
        if self._kind == "method":
            obj, *rest = self._args
            target = _resolve(obj, ctx)
            args = [_resolve(a, ctx) for a in rest]
            kwargs = {k: _resolve(v, ctx) for k, v in self._kwargs.items()}
            if self._payload == "__getitem__":
                return target[args[0]]
            return getattr(target, self._payload)(*args, **kwargs)
        if self._kind == "call":
            args = [_resolve(a, ctx) for a in self._args]
            kwargs = {k: _resolve(v, ctx) for k, v in self._kwargs.items()}
            return self._payload(*args, **kwargs)
        if self._kind == "apply":
            df = _resolve(self._args[0], ctx)
            y = _resolve(self._kwargs.get("y"), ctx) if self._kwargs else None
            if ctx.mode == "transform":
                fitted = ctx.state.get(self._uid)
                if fitted is None:
                    raise NotFittedError(
                        "plan evaluated in transform mode but this apply "
                        "node has no fitted state — call fit first"
                    )
                return fitted.transform(df)
            t = copy.deepcopy(_resolve(self._payload, ctx))
            out = t.fit_transform(df, y) if y is not None else t.fit_transform(df)
            ctx.state[self._uid] = t
            return out
        if self._kind == "eval_mode":
            return ctx.mode
        if self._kind == "subsample":
            df = _resolve(self._args[0], ctx)
            if ctx.mode != "preview" and not ctx.keep_subsampling:
                return df
            n, how, seed = self._payload
            if how == "head":
                return df.limit(n)
            # seeded fraction sample sized via a cheap count
            total = df.count()
            if total <= n:
                return df
            return df.sample(fraction=min(1.0, n / total * 1.1), seed=seed).limit(n)
        raise ValueError(self._kind)

    def _collect_choices(self, acc):
        _collect_choices(self._payload if self._kind == "literal" else None, acc)
        for a in self._args:
            _collect_choices(a, acc)
        for v in self._kwargs.values():
            _collect_choices(v, acc)

    def _node_label(self) -> str:
        if self._kind == "var":
            return f"var({self._payload!r})"
        if self._kind == "literal":
            return f"literal({type(self._payload).__name__})"
        name = self._payload if isinstance(self._payload, str) else getattr(
            self._payload, "__name__", type(self._payload).__name__
        )
        return f"{self._kind}:{name}"

    def _collect_graph(self, nodes, edges, seen, order=None):
        """Dependency-first DAG walk: fills ``nodes`` (uid -> label),
        ``edges`` (input uid -> consumer uid); shared subplans are
        visited once (memoized on uid, like evaluation)."""
        if self._uid in seen:
            return
        seen.add(self._uid)
        for a in self._args:
            if isinstance(a, DataOp):
                a._collect_graph(nodes, edges, seen, order)
                edges.append((a._uid, self._uid))
        for v in self._kwargs.values():
            if isinstance(v, DataOp):
                v._collect_graph(nodes, edges, seen, order)
                edges.append((v._uid, self._uid))
        nodes[self._uid] = self._node_label()
        if order is not None:
            order.append(self)

    def _describe(self, depth=0) -> str:
        pad = "  " * depth
        if self._kind == "var":
            return f"{pad}var({self._payload!r})"
        if self._kind == "literal":
            return f"{pad}literal({type(self._payload).__name__})"
        name = self._payload if isinstance(self._payload, str) else getattr(
            self._payload, "__name__", type(self._payload).__name__
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


def eval_mode() -> DataOp:
    """DataOp evaluating to the current mode string ('preview',
    'fit_transform' or 'transform') — reference
    `_data_ops/_data_ops.py:2060`. Lets a plan branch on train vs
    test time, e.g. `.skb.apply` a transformer only when fitting."""
    return DataOp("eval_mode", None)


def deferred(fn):
    """Wrap a function so calling it builds a DataOp instead of
    executing (skrub.deferred)."""

    def wrapper(*args, **kwargs):
        return DataOp("call", fn, args, kwargs)

    wrapper.__name__ = getattr(fn, "__name__", "deferred")
    return wrapper


class SkrubLearner:
    """Fit/transform view of a plan (reference: SkrubLearner in
    _data_ops/_evaluation.py — the plan IS the model).

    ``fit(env)`` evaluates in fit_transform mode and records every
    apply-node's fitted transformer; ``transform(env)`` re-evaluates
    the SAME plan with those transformers frozen, so a
    TableVectorizer fit on train emits the train vocabulary on test.
    """

    def __init__(self, plan: DataOp, params: dict | None = None):
        self.plan = plan
        self.params = params or {}
        self.state_: dict | None = None

    def fit(self, env: dict):
        self.state_ = {}
        self.result_ = self.plan.skb.eval(
            env, self.params, mode="fit_transform", state=self.state_
        )
        return self

    def fit_transform(self, env: dict):
        self.fit(env)
        return self.result_

    def transform(self, env: dict):
        if self.state_ is None:
            # plans with no apply nodes are stateless: evaluating is
            # fine (matches the old behavior transform=fit_transform)
            if not _has_apply(self.plan):
                return self.plan.skb.eval(env, self.params)
            raise NotFittedError("call fit(env) before transform(env)")
        return self.plan.skb.eval(
            env, self.params, mode="transform", state=self.state_
        )


def _has_apply(op) -> bool:
    if isinstance(op, DataOp):
        if op._kind == "apply":
            return True
        return (
            any(_has_apply(a) for a in op._args)
            or any(_has_apply(v) for v in op._kwargs.values())
            or _has_apply(op._payload)
        )
    if isinstance(op, (list, tuple)):
        return any(_has_apply(x) for x in op)
    if isinstance(op, dict):
        return any(_has_apply(v) for v in op.values())
    return False


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
        self.best_learner_ = SkrubLearner(self.plan, best_params)
        return self


class RandomizedParamSearch:
    """Budgeted random search with successive halving over the
    named choices in a plan — the dependency-free counterpart to
    the reference's ``OptunaParamSearch``
    (/root/reference/skrub/_data_ops/_optuna.py; optuna itself is
    absent from this environment, so the search strategy is
    reimplemented rather than wrapped: deterministic md5-seeded
    sampling + the Jamieson/Talwalkar successive-halving schedule,
    both public methods).

    ``n_candidates`` parameter combinations are drawn
    deterministically (content-addressed md5 over (seed, trial,
    choice-name) — reproducible across processes, no RNG state);
    each halving rung evaluates the survivors on a growing
    ``subsample`` fraction of the env's DataFrames (when
    ``subsample_var`` is set) and keeps the top half, so the full
    data is only seen by the finalists — the budget shape that
    matters when one evaluation is a 100 TB pipeline.

    API mirrors ``ParamSearch``: ``fit(env)`` sets ``results_``,
    ``best_params_``, ``best_score_``, ``best_learner_``."""

    def __init__(
        self,
        plan: DataOp,
        scorer,
        *,
        n_candidates: int = 8,
        seed: int = 0,
        subsample_var: str | None = None,
        subsample_key: str | None = None,
        min_fraction: float = 0.25,
    ):
        self.plan = plan
        self.scorer = scorer
        self.n_candidates = int(n_candidates)
        self.seed = int(seed)
        self.subsample_var = subsample_var
        # Column the rung subsample hashes on (content-addressed,
        # partition-layout-independent). None = hash the whole row
        # (to_json of struct(*)) — still deterministic, just costlier.
        self.subsample_key = subsample_key
        self.min_fraction = float(min_fraction)

    def _draw(self, choices, trial: int):
        import hashlib

        params = {}
        for c in choices:
            h = hashlib.md5(
                f"{self.seed}|{trial}|{c.name}".encode()
            ).hexdigest()
            params[c.name] = c.outcomes[int(h[:8], 16) % len(c.outcomes)]
        return params

    def fit(self, env: dict):
        import math

        choices = [c for c in self.plan.skb.choices() if c.name]
        cands, seen = [], set()
        trial = 0
        # draw until n_candidates DISTINCT combos (bounded by the
        # finite grid)
        grid = 1
        for c in choices:
            grid *= len(c.outcomes)
        want = min(self.n_candidates, grid) if choices else 1
        while len(cands) < want and trial < 1000:
            p = self._draw(choices, trial)
            key = tuple(sorted(p.items()))
            if key not in seen:
                seen.add(key)
                cands.append(p)
            trial += 1
        n_rungs = max(1, int(math.ceil(math.log2(max(1, len(cands))))))
        frac = self.min_fraction
        results = []
        rung_sizes = []
        while len(cands) > 1:
            rung_sizes.append(len(cands))
            rung_env = dict(env)
            if self.subsample_var is not None and frac < 1.0:
                # Content-addressed rung subsample: seeded df.sample()
                # is partition-layout-dependent (rung scores — and the
                # winner — would differ across clusters, contradicting
                # the md5-seeded determinism claim), so hash row
                # content instead (ADVICE r8).
                from pyspark.sql import functions as F

                from ..operators.sampling import deterministic_sample

                df = env[self.subsample_var]
                if self.subsample_key is not None:
                    key = F.col(self.subsample_key)
                else:
                    key = F.to_json(F.struct(*df.columns))
                rung_env[self.subsample_var] = deterministic_sample(
                    df, key, frac, salt=f"rps|{self.seed}"
                )
            scored = []
            for p in cands:
                out = self.plan.skb.eval(rung_env, p)
                s = self.scorer(out)
                scored.append((s, p))
                results.append(
                    {"params": p, "score": s, "fraction": frac}
                )
            scored.sort(
                key=lambda t: (-t[0], tuple(sorted(map(str, t[1].items()))))
            )
            cands = [p for _, p in scored[: max(1, len(scored) // 2)]]
            frac = min(1.0, frac * 2)
        # final evaluation of the winner on the FULL env
        best = cands[0] if cands else {}
        out = self.plan.skb.eval(env, best)
        best_score = self.scorer(out)
        results.append({"params": best, "score": best_score, "fraction": 1.0})
        self.results_ = results
        self.rung_sizes_ = rung_sizes
        self.n_rungs_ = n_rungs
        self.best_params_ = best
        self.best_score_ = best_score
        self.best_learner_ = SkrubLearner(self.plan, best)
        return self


def cross_validate(plan, df, k: int = 3, scorer=None, seed: int = 42,
                   var_name: str = "X"):
    """k-fold CV over a DataFrame.

    Two forms:
    - ``plan`` is a callable ``plan(train_df, test_df) -> score`` (or
      result, scored by ``scorer``) — imperative form.
    - ``plan`` is a :class:`DataOp` — a SkrubLearner is FIT on the
      train fold (apply nodes record fitted state) and TRANSFORMED on
      the test fold with that state frozen, the reference's
      train/test asymmetry (no re-fitting on test data).
    """
    splits = df.randomSplit([1.0] * k, seed=seed)
    scores = []
    for i in range(k):
        test = splits[i]
        train = None
        for j, s in enumerate(splits):
            if j != i:
                train = s if train is None else train.union(s)
        if isinstance(plan, DataOp):
            learner = SkrubLearner(plan).fit({var_name: train})
            res = learner.transform({var_name: test})
        else:
            res = plan(train, test)
        scores.append(scorer(res) if scorer else res)
    return scores

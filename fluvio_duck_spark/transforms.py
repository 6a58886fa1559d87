"""SmartModule transform chains as DataFrame transformations.

In the reference, ``--transforms-file`` (YAML), ``--transform`` (inline
JSON), or ``--smartmodule NAME`` each become an ordered list of
``SmartModuleInvocation``s executed as WASM *on the Fluvio SPU* before
records reach the scan (reference src/consume.rs:645-673, :713-741;
spec shape examples/short.yaml:1-29).  We do not run WASM: each transform
spec is interpreted into DataFrame operations over the record log
(columns ``offset, timestamp, partition, value``), applied before the row
budget — the same point in the pipeline where the SPU applies them.

Supported:

* ``infinyon/jolt@…`` with a jolt ``spec`` — the only module the reference's
  examples exercise.  We implement the literal subset those examples use
  (SURVEY §7 "genuinely hard bits"): ``shift`` with a nested input-path tree
  whose string leaves name output keys, and ``default`` for top-level
  missing-key fills.  The record's ``value`` is rewritten to the shifted
  JSON object, all inside Catalyst expressions (``get_json_object`` +
  ``to_json(struct(...))``) — no per-record Python.
* registered Python smartmodules — the extensibility analogue of named
  WASM modules from the hub: ``register_smartmodule(name, fn)`` where
  ``fn(df, params) -> df`` (filter/map kinds), or
  ``fn(df, params, accumulator) -> df`` for aggregate kinds used with
  ``--aggregate-initial`` (reference SmartModuleContextData::Aggregate,
  src/consume.rs:687-695).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fluvio_duck_spark.options import ConsumeOptions

TransformFn = Callable[..., DataFrame]


@dataclass
class TransformSpec:
    """One entry of a TransformationConfig: ``{uses: NAME, with: PARAMS}``."""

    uses: str
    params: dict = field(default_factory=dict)
    aggregate_initial: str | None = None


class TransformError(ValueError):
    pass


_REGISTRY: dict[str, TransformFn] = {}


def register_smartmodule(name: str, fn: TransformFn) -> None:
    """Register a named transform, the analogue of a hub smartmodule
    (``SmartModuleInvocationWasm::Predefined``, reference
    src/consume.rs:728-734)."""
    _REGISTRY[name] = fn


def _jolt_leaves(spec_tree: dict, prefix: tuple[str, ...] = ()) -> list[tuple[str, str]]:
    """Walk a jolt-shift spec tree → [(input.dot.path, output_name)]."""
    out: list[tuple[str, str]] = []
    for key, val in spec_tree.items():
        path = prefix + (key,)
        if isinstance(val, dict):
            out.extend(_jolt_leaves(val, path))
        elif isinstance(val, str):
            out.append((".".join(path), val))
        else:
            raise TransformError(f"unsupported jolt shift leaf at {'.'.join(path)}: {val!r}")
    return out


def jolt_transform(df: DataFrame, params: dict) -> DataFrame:
    """Interpret a jolt spec (list of operations) against the ``value``
    JSON payload, rewriting ``value`` in place."""
    spec = params.get("spec")
    if isinstance(spec, str):
        spec = json.loads(spec)
    if not isinstance(spec, list):
        raise TransformError("jolt `spec` must be a list of operations")

    value = F.col("value")
    for op in spec:
        kind = op.get("operation")
        op_spec = op.get("spec", {})
        if kind == "shift":
            pairs = _jolt_leaves(op_spec)
            value = F.to_json(
                F.struct(
                    *[
                        F.get_json_object(value, "$." + in_path).alias(out_name)
                        for in_path, out_name in pairs
                    ]
                )
            )
        elif kind == "default":
            # top-level fills: keep existing value for key, else the default
            fields = [
                F.coalesce(
                    F.get_json_object(value, "$." + key), F.lit(json.dumps(default))
                ).alias(key)
                for key, default in op_spec.items()
            ]
            value = F.to_json(F.struct(*fields))
        else:
            raise TransformError(f"unsupported jolt operation: {kind!r}")
    return df.withColumn("value", value)


def sql_filter_transform(df: DataFrame, params: dict) -> DataFrame:
    """Built-in filter-kind smartmodule: ``-e where=<sql predicate over
    offset/timestamp/value>`` — the DataFrame analogue of a WASM filter."""
    predicate = params.get("where")
    if not predicate:
        raise TransformError("sql-filter requires -e where=<predicate>")
    return df.filter(predicate)


def sql_map_transform(df: DataFrame, params: dict) -> DataFrame:
    """Built-in map-kind smartmodule: ``-e value=<sql expr>`` rewrites the
    record payload."""
    expr = params.get("value")
    if not expr:
        raise TransformError("sql-map requires -e value=<expr>")
    return df.withColumn("value", F.expr(expr).cast("string"))


def aggregate_sum_transform(df: DataFrame, params: dict, accumulator: str = "0") -> DataFrame:
    """Built-in aggregate-kind smartmodule (A1): sequential fold over the
    record log in offset order — ``acc := acc + payload[field]`` seeded by
    ``--aggregate-initial`` — rewriting each record's value with the
    accumulator so far, exactly how a WASM aggregate emits per record.

    A sequential fold is inherently serial, so the default uses a global
    ordered window (single-partition shuffle) — faithful to the reference,
    which folds on one SPU partition.  ``-e partitioned=true`` folds per
    ``partition`` column instead — the reference's ACTUAL per-SPU
    semantics under ``-A`` (each SPU folds its own log independently,
    src/consume.rs:687-695), and the form that scales: the shuffle is
    keyed by partition, so a 1000-partition topic folds on 1000 tasks
    instead of one.  For unbounded logs use
    streaming.stateful.aggregate_fold_stream."""
    from pyspark.sql import Window

    field = params.get("field", "k")
    init = int(accumulator or "0")
    partitioned = str(params.get("partitioned", "")).lower() in ("true", "1", "yes")
    base = (
        Window.partitionBy("partition") if partitioned else Window.partitionBy()
    )
    w = base.orderBy("offset").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    running = F.lit(init) + F.sum(
        F.get_json_object(F.col("value"), f"$.{field}").try_cast("long")
    ).over(w)
    return df.withColumn("value", running.cast("string"))


register_smartmodule("infinyon/jolt@0.1.0", jolt_transform)
register_smartmodule("sum-aggregate", aggregate_sum_transform)
register_smartmodule("jolt", jolt_transform)
register_smartmodule("sql-filter", sql_filter_transform)
register_smartmodule("sql-map", sql_map_transform)


def _specs_from_config(config: dict | list) -> list[TransformSpec]:
    transforms = config.get("transforms", []) if isinstance(config, dict) else config
    specs = []
    for t in transforms:
        if "uses" not in t:
            raise TransformError(f"transform entry missing `uses`: {t!r}")
        specs.append(TransformSpec(uses=t["uses"], params=dict(t.get("with", {}))))
    return specs


def load_transform_chain(opts: ConsumeOptions) -> list[TransformSpec]:
    """Build the ordered invocation list exactly like ``generate_config``
    (reference src/consume.rs:650-673): --smartmodule wins, then inline
    --transform JSON strings, then --transforms-file YAML."""
    if opts.smartmodule is not None or opts.smartmodule_path is not None:
        name = opts.smartmodule or str(opts.smartmodule_path)
        return [
            TransformSpec(
                uses=name,
                params=dict(opts.params),
                aggregate_initial=opts.aggregate_initial,
            )
        ]
    if opts.transform:
        return _specs_from_config([json.loads(t) for t in opts.transform])
    if opts.transforms_file:
        import yaml

        with open(opts.transforms_file) as fh:
            config = yaml.safe_load(fh)
        return _specs_from_config(config)
    return []


def apply_transform_chain(df: DataFrame, chain: list[TransformSpec]) -> DataFrame:
    for spec in chain:
        fn = _REGISTRY.get(spec.uses)
        if fn is None:
            raise TransformError(
                f"unknown smartmodule {spec.uses!r}; register it with "
                "fluvio_duck_spark.transforms.register_smartmodule"
            )
        if spec.aggregate_initial is not None:
            df = fn(df, spec.params, spec.aggregate_initial)
        else:
            df = fn(df, spec.params)
    return df

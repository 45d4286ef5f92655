"""State-store & materialization config ops (SURVEY.md §2.7).

Reference: :stores factory /root/reference/src/cddr/ksml/eval.clj:216-226
(inMemory/persistent × kv/window/session/lru/timestamped),
:materialized eval.clj:169-173 (+ :as/:with forms eval_test.clj:148-159),
caching/logging/retention modifiers eval.clj:204-208, :grouped
eval.clj:181-185.

In Spark, state lives in the streaming state store (HDFS or RocksDB
provider) behind stateful operators; these forms therefore evaluate to
CONFIG metadata: store kind maps to a state-store provider preference,
:materialized [:as name] names the serving sink (SURVEY.md §2.8), and
:withRetention becomes the watermark delay. All are accepted by the
aggregation/table ops and recorded — constructive parity with the
reference's test suite (eval_test.clj:143-159) — while execution knobs
(checkpoint dir, provider class) are applied at session/sink level.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..eval import Ctx, defop


@dataclass
class StoreSpec:
    kind: str  # kv | window | session | lru | timestamped-kv
    persistent: bool = True
    name: Optional[str] = None
    retention: Optional[str] = None  # interval string -> watermark delay
    caching: Optional[bool] = None
    logging: Optional[bool] = None


@dataclass
class Materialized:
    """[:materialized ...] — names the result + store config."""

    name: Optional[str] = None
    store: Optional[StoreSpec] = None
    retention: Optional[str] = None
    key_serde: object = None
    value_serde: object = None
    caching: Optional[bool] = None
    logging: Optional[bool] = None


_STORE_KINDS = {
    "in-memory-key-value-store": ("kv", False),
    "persistent-key-value-store": ("kv", True),
    "in-memory-window-store": ("window", False),
    "persistent-window-store": ("window", True),
    "in-memory-session-store": ("session", False),
    "persistent-session-store": ("session", True),
    "persistent-timestamped-key-value-store": ("timestamped-kv", True),
    "lru-map": ("lru", False),
    # camelCase aliases as they appear in the reference DSL
    "inmemorykeyvaluestore": ("kv", False),
    "persistentkeyvaluestore": ("kv", True),
    "inmemorywindowstore": ("window", False),
    "persistentwindowstore": ("window", True),
    "inmemorysessionstore": ("session", False),
    "persistentsessionstore": ("session", True),
    "persistenttimestampedkeyvaluestore": ("timestamped-kv", True),
    "lrumap": ("lru", False),
}


@defop("stores", "store")
def op_stores(ctx: Ctx, which, *args) -> StoreSpec:
    """[:stores :persistentKeyValueStore name?] (eval.clj:216-226;
    eval_test.clj:143-146). Maps to a state-store provider preference."""
    key = str(which).lstrip(":").replace("_", "-").lower()
    norm = _STORE_KINDS.get(key) or _STORE_KINDS.get(key.replace("-", ""))
    if norm is None:
        from ..errors import UnknownOperatorError

        raise UnknownOperatorError(f":stores {which!r}")
    kind, persistent = norm
    name = next((a for a in args if isinstance(a, str)), None)
    opts = {}
    for a in args:
        if isinstance(a, dict):
            # None-valued keys mean "unset" (the opts_of contract)
            opts.update({k: v for k, v in a.items() if v is not None})
    if kind == "lru" and not opts.get("unbounded_ok"):
        # Stores.lruMap(name, maxEntries) (eval.clj:222) is a BOUNDED kv
        # store: past maxEntries, Kafka Streams silently evicts the
        # least-recently-used key — reads of an evicted key restart from
        # the initializer. Spark's state store has no per-access
        # eviction; pretending otherwise would either lie about the
        # memory bound (unbounded state sold as bounded) or about the
        # data (we don't drop keys). So the op refuses with the honest
        # mapping spelled out instead of silently accepting.
        from ..errors import TypeDispatchError

        raise TypeDispatchError(
            ":stores :lruMap is a bounded store with silent LRU key "
            "eviction — Spark state stores are unbounded per key and "
            "bound state by TIME, not access recency. Either bound by "
            "time: [:with-retention m [:duration ...]] (watermark/TTL, "
            "the Spark-native bound), or accept unbounded-kv superset "
            "semantics (no key ever evicted) explicitly: "
            '[:stores :lruMap name {"unbounded_ok": true}]'
        )
    spec = StoreSpec(kind, persistent, name)
    spec.retention = opts.get("retention", spec.retention)
    return spec


@defop("materialized")
def op_materialized(ctx: Ctx, *mods) -> Materialized:
    """[:materialized [:as "name"]] / [:materialized [:with kserde vserde]]
    + modifier chain (eval.clj:169-173,204-208; eval_test.clj:148-159)."""
    from ..exprs import Serde

    m = Materialized()
    def absorb(x):
        if isinstance(x, Materialized):
            for f_ in ("name", "store", "retention", "caching", "logging"):
                if getattr(x, f_) is not None:
                    setattr(m, f_, getattr(x, f_))
        elif isinstance(x, StoreSpec):
            m.store = x
        elif isinstance(x, Serde):
            if m.key_serde is None:
                m.key_serde = x
            else:
                m.value_serde = x
        elif isinstance(x, str):
            m.name = x
        elif isinstance(x, dict):
            m.retention = x.get("retention", m.retention)
            m.name = x.get("as", m.name)
        elif isinstance(x, list):
            for y in x:
                absorb(y)

    for x in mods:
        absorb(x)
    return m


@defop("as")
def op_as(ctx: Ctx, name) -> Materialized:
    """[:as "store-name"] (eval_test.clj:148) — names the materialization."""
    if isinstance(name, StoreSpec):
        return Materialized(name=name.name, store=name)
    return Materialized(name=str(name))


@defop("with-caching-enabled")
def op_caching_on(ctx: Ctx, m: Materialized) -> Materialized:
    """[:withCachingEnabled m] (eval.clj:204) — no-op perf knob in Spark
    (micro-batch already batches state updates)."""
    m.caching = True
    return m


@defop("with-caching-disabled")
def op_caching_off(ctx: Ctx, m: Materialized) -> Materialized:
    m.caching = False
    return m


@defop("with-logging-enabled")
def op_logging_on(ctx: Ctx, m: Materialized, cfg=None) -> Materialized:
    """[:withLoggingEnabled m cfg] (eval.clj:206) — changelog ≈ Spark
    checkpoint WAL, always on; recorded for parity."""
    m.logging = True
    return m


@defop("with-logging-disabled")
def op_logging_off(ctx: Ctx, m: Materialized) -> Materialized:
    m.logging = False
    return m


@defop("with-retention")
def op_with_retention(ctx: Ctx, m: Materialized, retention) -> Materialized:
    """[:withRetention m [:duration "PT24H"]] (eval.clj:208;
    eval_test.clj:157-158) — becomes the watermark delay (state TTL)."""
    m.retention = retention
    return m


@defop("grouped")
def op_grouped(ctx: Ctx, *mods) -> dict:
    """[:grouped [:with kserde vserde]] / [:as name] (eval.clj:181-185) —
    serde hints for the shuffle; config-only in Spark."""
    out = {"grouped": True}
    for x in mods:
        if isinstance(x, Materialized):
            out["name"] = x.name
        elif isinstance(x, str):
            out["name"] = x
    return out

"""External data-source API parity — the reference's pluggable scan
surface (DataSourceScanNode, be/src/exec/data-source-scan-node.h:38;
API + sample source under ext-data-source/). There, an external service
returns row batches and may accept pushed conjuncts
(accepted_conjuncts); here the same contract is Spark 4's Python
DataSource API: `partitions()` (split planning), `read(partition)`
(row batches), and `pushFilters` (accepted filters narrow the scan,
rejected ones stay in the Spark plan — exactly the accepted_conjuncts
protocol).

The built-in demo source `ext_kv` deterministically generates
(id BIGINT, k STRING, v DOUBLE) with id in [0, rows): k = 'k'||(id%10),
v = id*0.5. Range predicates on `id` are pushed: they shrink the planned
id range BEFORE partitions are created, so pushdown is visible as fewer /
narrower input partitions (asserted in tests via a driver-side trace
file, since pushFilters/partitions run on the driver).

Scale notes: partitions() returns `partitions` independent splits — the
executor-parallel unit, same as the reference's scan-range assignment;
generation is pure per-partition compute, no driver materialization.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCHEMA = "id BIGINT, k STRING, v DOUBLE"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class ExtKVReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", "1000"))
        self.nparts = int(options.get("partitions", "4"))
        self.lo = 0
        self.hi = self.rows
        self.trace_path = options.get("pushdown_trace")

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Accept range conjuncts on `id` (narrowing [lo, hi)); everything
        else is returned unsupported and evaluated by Spark — the
        accepted_conjuncts split of the reference API."""
        accepted: list[str] = []
        for f in filters:
            is_id = getattr(f, "attribute", None) == ("id",)
            if is_id and isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif is_id and isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif is_id and isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif is_id and isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif is_id and isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # unsupported → Spark keeps it in the plan
                continue
            accepted.append(repr(f))
        if self.trace_path:
            with open(self.trace_path, "w") as fh:
                json.dump({"accepted": accepted, "lo": self.lo, "hi": self.hi}, fh)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_RangePartition(lo, lo)]
        step = math.ceil(n / self.nparts)
        return [
            _RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i, f"k{i % 10}", i * 0.5)


class ExtKVDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ext_kv"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ExtKVReader:
        return ExtKVReader(self.options)


def register(spark) -> None:
    # runtime SQL conf: a reader implementing pushFilters is rejected
    # outright unless Python-source pushdown is enabled. Set here so the
    # source works under any caller's session (incl. the plain driver
    # session of the verify harness).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    # DataSource classes round-trip through cloudpickle into workers —
    # see serde module docstring.
    from minimised_impala_spark.serde import pickle_module_by_value

    pickle_module_by_value(__name__)
    spark.dataSource.register(ExtKVDataSource)

"""Metrics port — ≙ MetricsPort (legacy MetricsPort.java:3-6).

Counters and gauges; counters are backed by Spark accumulators so
executor-side code (foreachPartition copy loops, streaming batches) can
increment them and the driver reads a consistent total.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class Metrics:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._counters: dict[str, object] = {}
        self._gauges: dict[str, float] = {}

    def counter(self, name: str):
        if name not in self._counters:
            self._counters[name] = self._spark.sparkContext.accumulator(0)
        return self._counters[name]

    def increment(self, name: str, amount: int = 1) -> None:
        self.counter(name).add(amount)

    def value(self, name: str) -> int:
        return self.counter(name).value

    def observe(self, name: str, value: float) -> None:
        self._gauges[name] = value

    def gauge(self, name: str) -> float | None:
        return self._gauges.get(name)

    def snapshot(self) -> dict[str, float]:
        out = {name: acc.value for name, acc in self._counters.items()}
        out.update(self._gauges)
        return out

"""HyCatalog — namespace/table catalog over a warehouse directory.

≙ the reference CatalogPort's namespace surface (CatalogPort.scala:22-40):
listTables / tableExists / createTable / dropTable / listNamespaces, with
``TableId = (namespace, name)`` (TableId.scala:11-26) mapping to
``<warehouse>/<namespace>/<name>`` directories.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .table import HyTable


class NoSuchTable(Exception):
    pass


class HyCatalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    def _split(self, identifier: str) -> tuple[str, str]:
        if "." not in identifier:
            raise ValueError(f"expected namespace.table, got {identifier!r}")
        ns, _, name = identifier.partition(".")
        if not ns or not name:
            raise ValueError(f"invalid identifier {identifier!r}")
        return ns, name

    def _root(self, identifier: str) -> str:
        ns, name = self._split(identifier)
        return os.path.join(self.warehouse, ns, name)

    # ---- CatalogPort surface ----------------------------------------------

    def table_exists(self, identifier: str) -> bool:
        return HyTable(self.spark, self._root(identifier)).exists()

    def create_table(
        self, identifier: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> HyTable:
        t = HyTable(self.spark, self._root(identifier))
        t.create(df, partition_by=partition_by)
        return t

    def load_table(self, identifier: str) -> HyTable:
        t = HyTable(self.spark, self._root(identifier))
        if not t.exists():
            raise NoSuchTable(identifier)
        return t

    def drop_table(self, identifier: str) -> bool:
        root = self._root(identifier)
        if not HyTable(self.spark, root).exists():
            return False
        shutil.rmtree(root)
        return True

    def list_namespaces(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def list_tables(self, namespace: str) -> list[str]:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_dir):
            return []
        out = []
        for name in sorted(os.listdir(ns_dir)):
            if HyTable(self.spark, os.path.join(ns_dir, name)).exists():
                out.append(f"{namespace}.{name}")
        return out

    def list_tables_paginated(
        self, namespace: str, page_size: int = 1000, offset: int = 0
    ) -> tuple[list[str], bool]:
        """≙ listTablesPaginated with the 10k page cap (Pagination.scala:9)."""
        if page_size > 10_000:
            raise ValueError("page size capped at 10000")
        names = self.list_tables(namespace)
        page = names[offset : offset + page_size]
        return page, offset + page_size < len(names)

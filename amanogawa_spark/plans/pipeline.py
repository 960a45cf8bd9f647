"""Named-stage dataflow DAG — the reference's config/DAG surface, Spark-first.

The reference declares pipelines as TOML component graphs in five classes
(source / flow / branch / confluence / sink, ``include/common.h:7-11``)
wired by ``from``/``to`` name references, topologically executed with every
intermediate materialized (``core/executor.h:24-72``). Here the same
authoring surface builds a *lazy* DataFrame DAG: nothing materializes
until a sink runs, Catalyst fuses the whole graph, and multi-consumer
nodes can opt into ``persist()`` instead of the reference's always-on
materialization.

Components are plain callables registered by (clazz, type) — the Python
replacement for the reference's ``dlopen("lib{clazz}_{type}.so")`` plugin
loading (``core/dl.h:29-43``).

Example::

    p = Pipeline()
    p.source("pages", lambda spark: spark.read.parquet(path))
    p.flow("edges", frm="pages", fn=extract_edges_urls)
    p.confluence("joined", left="edges", right="dict", fn=my_join)
    p.sink("out", frm="joined", fn=lambda df: df.write.parquet(out))
    results = p.run(spark)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class _Node:
    name: str
    clazz: str  # source | flow | branch | confluence | sink
    fn: Callable
    inputs: list[str] = field(default_factory=list)
    persist: bool = False


class Pipeline:
    def __init__(self) -> None:
        self._nodes: dict[str, _Node] = {}

    def _add(self, node: _Node) -> "Pipeline":
        if node.name in self._nodes:
            raise ValueError(f"duplicate component name: {node.name}")
        self._nodes[node.name] = node
        return self

    def source(self, name: str, fn: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        return self._add(_Node(name, "source", fn))

    def flow(
        self, name: str, frm: str, fn: Callable[[DataFrame], DataFrame], persist: bool = False
    ) -> "Pipeline":
        return self._add(_Node(name, "flow", fn, [frm], persist))

    def branch(
        self, name: str, frm: str, fn: Callable[[DataFrame], dict[str, DataFrame]]
    ) -> "Pipeline":
        """fn returns {output_name: df}; outputs addressable as 'name.output'."""
        return self._add(_Node(name, "branch", fn, [frm]))

    def confluence(
        self,
        name: str,
        left: str,
        right: str,
        fn: Callable[[DataFrame, DataFrame], DataFrame],
    ) -> "Pipeline":
        return self._add(_Node(name, "confluence", fn, [left, right]))

    def sink(self, name: str, frm: str, fn: Callable[[DataFrame], None]) -> "Pipeline":
        return self._add(_Node(name, "sink", fn, [frm]))

    # -- execution -----------------------------------------------------------
    def _toposort(self) -> list[_Node]:
        """Kahn BFS from sources; raises on cycles (flow_graph.h:60-81 parity)."""
        deps = {
            n.name: {i.split(".")[0] for i in n.inputs} for n in self._nodes.values()
        }
        ready = sorted(n for n, d in deps.items() if not d)
        queued = set(ready)
        order: list[str] = []
        remaining = {n: set(d) for n, d in deps.items() if n not in queued}
        while ready:
            cur = ready.pop(0)
            order.append(cur)
            freed = []
            for n, d in remaining.items():
                d.discard(cur)
                if not d:
                    freed.append(n)
            for n in sorted(freed):
                remaining.pop(n)
                ready.append(n)
        if remaining:
            raise ValueError(f"Not a DAG: cycle among {sorted(remaining)}")
        return [self._nodes[n] for n in order]

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        """Execute sinks; return every named intermediate (lazily built)."""
        slots: dict[str, DataFrame] = {}

        def resolve(ref: str) -> DataFrame:
            if ref not in slots:
                raise KeyError(f"unknown input reference: {ref}")
            return slots[ref]

        for node in self._toposort():
            if node.clazz == "source":
                out = node.fn(spark)
                slots[node.name] = out
            elif node.clazz == "flow":
                out = node.fn(resolve(node.inputs[0]))
                if node.persist:
                    out = out.persist()
                slots[node.name] = out
            elif node.clazz == "branch":
                outs = node.fn(resolve(node.inputs[0]))
                for sub, df in outs.items():
                    slots[f"{node.name}.{sub}"] = df
            elif node.clazz == "confluence":
                slots[node.name] = node.fn(resolve(node.inputs[0]), resolve(node.inputs[1]))
            elif node.clazz == "sink":
                node.fn(resolve(node.inputs[0]))
        return slots

"""Workflow scheduling: a Flow/Node DAG, orchestrator adapters, and the
join-backfill flow builder.

Reference surface: api/py/ai/chronon/scheduler/ — Flow (a named DAG of
nodes, interfaces/flow.py), Node (name + command + settings + dependencies,
interfaces/node.py), WorkflowOrchestrator (setup / schedule_task /
set_dependencies / build_dag_from_flow / trigger_run,
interfaces/orchestrator.py), AirflowAdapter (BashOperator per node,
adapters/airflow_adapter.py) — plus repo/join_backfill.py's flow shape:
one left-table node, one node per join part fanned out in parallel, one
final-assembly node depending on every part.

This analog schedules OUR CLI (``python -m chronon_spark ...``): the part
nodes run ``join-final --selected-parts <prefix>`` (materialize one part
table, skip assembly) and the final node runs a full ``join-final`` that
RESUMES every part table by semantic hash — so the fan-out is free of
recomputation by construction, not by scheduler bookkeeping. Airflow is not
installed in this sandbox, so the adapter's primary mode EMITS a standalone
DAG file (the artifact a real deployment ships to the Airflow repo); the
in-process DAG-object path activates when ``airflow`` is importable.
"""

from __future__ import annotations

import shlex
import subprocess
import sys
from abc import ABC, abstractmethod


class Node:
    """One schedulable task: a name, an argv command, and its upstream
    dependencies. Equality/hash by name (reference node.py:1-20)."""

    def __init__(self, name: str, command: list[str], settings: dict | None = None):
        self.name = name
        self.command = list(command)
        self.settings = dict(settings or {})
        self.dependencies: set[Node] = set()

    def add_dependency(self, node: "Node") -> None:
        self.dependencies.add(node)

    def __eq__(self, other) -> bool:
        return isinstance(other, Node) and self.name == other.name

    def __hash__(self) -> int:
        return hash(self.name)

    def __repr__(self) -> str:
        return f"Node({self.name})"


class Flow:
    """A named DAG of nodes (reference flow.py:1-30) with the two
    operations every adapter needs: cycle-checked topological order and a
    text visualization."""

    def __init__(self, name: str):
        self.name = name
        self.nodes: set[Node] = set()

    def add_node(self, node: Node) -> None:
        self.nodes.add(node)

    def find_node(self, name: str) -> Node | None:
        for n in self.nodes:
            if n.name == name:
                return n
        return None

    def topo_order(self) -> list[Node]:
        """Dependency-respecting order (dependencies before dependents),
        deterministic (name-sorted among ready nodes); raises on a cycle —
        a scheduler must never sit on a DAG that cannot finish."""
        order: list[Node] = []
        done: set[Node] = set()
        remaining = set(self.nodes)
        while remaining:
            ready = sorted(
                (n for n in remaining if n.dependencies <= done),
                key=lambda n: n.name,
            )
            if not ready:
                cyc = sorted(n.name for n in remaining)
                raise ValueError(f"flow '{self.name}' has a dependency cycle among {cyc}")
            for n in ready:
                order.append(n)
                done.add(n)
                remaining.discard(n)
        return order

    def visualize(self) -> str:
        """Sink-rooted dependency tree (reference flow.py:17-30, returned
        instead of printed)."""
        lines: list[str] = []
        sinks = [
            n for n in self.nodes
            if not any(n in m.dependencies for m in self.nodes)
        ]

        def walk(node: Node, level: int) -> None:
            lines.append("    " * level + f"- {node.name}")
            for dep in sorted(node.dependencies, key=lambda n: n.name):
                walk(dep, level + 1)

        for s in sorted(sinks, key=lambda n: n.name):
            walk(s, 0)
        return "\n".join(lines)


class WorkflowOrchestrator(ABC):
    """Adapter contract (reference orchestrator.py)."""

    @abstractmethod
    def setup(self):
        ...

    @abstractmethod
    def schedule_task(self, node: Node):
        ...

    @abstractmethod
    def set_dependencies(self, task, dependencies):
        ...

    @abstractmethod
    def build_dag_from_flow(self, flow: Flow):
        ...

    @abstractmethod
    def trigger_run(self):
        ...


class LocalAdapter(WorkflowOrchestrator):
    """Runs a flow's nodes as subprocesses in topological order — the
    zero-infrastructure orchestrator (and the only executable one in this
    sandbox). A failing node fails fast; downstream nodes never run."""

    def __init__(self, env: dict | None = None, capture: bool = True):
        self.env = env
        self.capture = capture
        self._order: list[Node] = []
        self.results: list[dict] = []

    def setup(self):
        return self

    def schedule_task(self, node: Node):
        return node

    def set_dependencies(self, task, dependencies):
        return None  # order already encodes them

    def build_dag_from_flow(self, flow: Flow):
        self._order = flow.topo_order()
        return self._order

    def trigger_run(self) -> list[dict]:
        self.results = []
        for node in self._order:
            proc = subprocess.run(
                node.command,
                capture_output=self.capture,
                text=True,
                env=self.env,
            )
            self.results.append(
                {
                    "task": node.name,
                    "returncode": proc.returncode,
                    "stdout": proc.stdout if self.capture else None,
                }
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"task '{node.name}' failed (rc={proc.returncode}):\n"
                    f"{(proc.stderr or '')[-2000:] if self.capture else ''}"
                )
        return self.results


class AirflowAdapter(WorkflowOrchestrator):
    """BashOperator-per-node Airflow adapter (reference
    airflow_adapter.py:10-45). Without an importable ``airflow`` this
    adapter still does its real job — ``emit_dag_file`` renders the
    standalone DAG module a deployment ships; with airflow installed,
    ``build_dag_from_flow`` constructs the live DAG object."""

    def __init__(self, dag_id: str, start_date: str, schedule_interval: str = "@once"):
        self.dag_id = dag_id
        self.start_date = start_date
        self.schedule_interval = schedule_interval
        self.dag = None

    def setup(self):
        import airflow  # noqa: F401 — presence probe only

        return self

    def schedule_task(self, node: Node):
        from airflow.operators.bash import BashOperator

        return BashOperator(
            task_id=node.name, dag=self.dag, bash_command=shlex.join(node.command)
        )

    def set_dependencies(self, task, dependencies):
        task.set_upstream(dependencies)

    def build_dag_from_flow(self, flow: Flow):
        from datetime import datetime

        from airflow import DAG

        self.dag = DAG(
            self.dag_id,
            start_date=datetime.strptime(self.start_date, "%Y-%m-%d"),
            schedule_interval=self.schedule_interval,
        )
        tasks = {n.name: self.schedule_task(n) for n in flow.nodes}
        for n in flow.nodes:
            for dep in n.dependencies:
                self.set_dependencies(tasks[n.name], tasks[dep.name])
        return self.dag

    def trigger_run(self):
        raise NotImplementedError("trigger via the Airflow scheduler, not in-process")

    def emit_dag_file(self, flow: Flow, path: str) -> str:
        """Render the flow as a self-contained Airflow DAG module."""
        lines = [
            '"""Auto-generated by chronon_spark.scheduler.AirflowAdapter — do not edit."""',
            "from datetime import datetime",
            "",
            "from airflow import DAG",
            "from airflow.operators.bash import BashOperator",
            "",
            f"dag = DAG(",
            f"    {self.dag_id!r},",
            f"    start_date=datetime.strptime({self.start_date!r}, '%Y-%m-%d'),",
            f"    schedule_interval={self.schedule_interval!r},",
            f")",
            "",
        ]
        order = flow.topo_order()  # also validates acyclicity before emit
        var_of = {n.name: f"t{i}" for i, n in enumerate(order)}
        for n in order:
            lines.append(
                f"{var_of[n.name]} = BashOperator(task_id={n.name!r}, dag=dag, "
                f"bash_command={shlex.join(n.command)!r})"
            )
        lines.append("")
        for n in order:
            for dep in sorted(n.dependencies, key=lambda d: d.name):
                lines.append(f"{var_of[n.name]}.set_upstream({var_of[dep.name]})")
        text = "\n".join(lines) + "\n"
        with open(path, "w") as f:
            f.write(text)
        return path


def join_backfill_flow(
    join,
    conf_path: str,
    out_root: str,
    start_ds: str,
    end_ds: str,
    python: str | None = None,
    settings: dict | None = None,
) -> Flow:
    """The reference join-backfill flow shape (repo/join_backfill.py:56-95)
    over this repo's CLI: ``join-left`` -> one ``join-final
    --selected-parts <prefix>`` node per part (parallel; each materializes
    only its own resumable part table) -> a full ``join-final`` that
    resumes every part table and assembles. Per-node ``settings`` are
    carried for the adapter (spark-submit sizing on a real cluster)."""
    py = python or sys.executable
    base = [py, "-m", "chronon_spark"]
    rng = ["--conf", conf_path, "--out-root", out_root,
           "--start-ds", start_ds, "--end-ds", end_ds]
    flow = Flow(join.name)
    left = Node(f"compute_join__{join.name}__left_table", [*base, "join-left", *rng],
                settings)
    final = Node(f"compute_join__{join.name}", [*base, "join-final", *rng], settings)
    flow.add_node(left)
    flow.add_node(final)
    for part in join.join_parts:
        prefix = part.full_prefix()
        node = Node(
            f"compute_join__{join.name}__{prefix}",
            [*base, "join-final", *rng, "--selected-parts", prefix],
            settings,
        )
        node.add_dependency(left)
        final.add_dependency(node)
        flow.add_node(node)
    return flow

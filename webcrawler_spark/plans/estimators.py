"""Driver-side tiny state: the semantic (topic) estimator.

Exact semantic ports of the reference's KB-sized cluster state
(SURVEY.md §2.6 A2-A5). This state is intentionally *driver-side* in the
Spark engine — it is at most (targets+1) sparse vectors plus two running
sums, broadcast down to executors each wave; all big state (frontier,
seen, edges, page term vectors) is distributed.

Sources:
- AverageVector.scala:12-21 — running vector sum; ``normal`` of the sum.
- TargetVector.scala:6-48 — top-k cluster of vectors most collinear with
  their own running mean; quirks preserved (see class docstring).
- TargetVectorCluster.scala:28-66 — sigma-criterion variant.
- SemanticEstimator.scala:11-48 — central/target/average;
  ``factor = target.normal - average.normal``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from webcrawler_spark.kernels.vectors import SparseVector


class AverageVector:
    """AverageVector.scala: accumulates a vector sum; ``normal`` of the sum
    is the mean direction."""

    __slots__ = ("v",)

    def __init__(self, v: SparseVector | None = None):
        self.v = v if v is not None else SparseVector()

    def add(self, v1: SparseVector) -> "AverageVector":
        return AverageVector(self.v + v1)

    def sub(self, v1: SparseVector) -> "AverageVector":
        return AverageVector(self.v - v1)

    @property
    def normal(self) -> SparseVector:
        return self.v.normal


class TargetVector:
    """TargetVector.scala:15-31.

    Keeps at most n+1 vectors most collinear with their own running mean.
    Quirks preserved from the reference:
    - acceptance priority uses ``v.normal * average.normal`` (:16) but the
      re-scoring in ``factory`` uses the *unnormalized* ``average.normal * x``
      (:9-13) — identical when all stored vectors are unit (they are: the
      estimator folds v.normal);
    - a new vector is accepted unconditionally while fewer than n+1 vectors
      are held (``vs.length > n`` guard at :17);
    - when full, the global minimum is dropped; if the minimum is the
      newcomer itself, the newcomer is rejected and no callback fires (:18-22).
    """

    def __init__(self, average: AverageVector, vs: list[tuple[float, SparseVector]], n: int):
        self.average = average
        self.vs = vs
        self.n = n

    @classmethod
    def empty(cls, n: int = 9) -> "TargetVector":
        return cls(AverageVector(), [], n)

    def _factory(self, average: AverageVector, vs: list[tuple[float, SparseVector]]):
        return type(self)(
            average, [(average.normal.dot(x), x) for (_, x) in vs], self.n
        )

    def add(self, v1: SparseVector, callback=None) -> "TargetVector":
        priority = v1.normal.dot(self.average.normal)
        if len(self.vs) > self.n:
            cand = [(priority, v1)] + self.vs
            # stable sort ascending by priority (scala sortBy is stable)
            cand.sort(key=lambda pv: pv[0])
            (p, v), rest = cand[0], cand[1:]
            if v == v1:
                return self
            if callback:
                callback()
            return self._factory(self.average.sub(v).add(v1), rest)
        if callback:
            callback()
        return self._factory(self.average.add(v1), [(priority, v1)] + self.vs)

    @property
    def normal(self) -> SparseVector:
        return self.average.normal


class TargetVectorCluster(TargetVector):
    """TargetVectorCluster.scala:28-66 — sigma (RMS distance) criterion:
    priority is the *distance* ``||mean - v||``; accept only if sigma
    shrinks (after the first 2 vectors)."""

    @property
    def sigma(self) -> float:
        if not self.vs:
            return float("nan")
        return math.sqrt(sum(p for p, _ in self.vs) / len(self.vs))

    def priority_of(self, v: SparseVector) -> float:
        return (self.normal - v).norm

    def add(self, v1: SparseVector, callback=None) -> "TargetVectorCluster":
        p = self.priority_of(v1)
        if len(self.vs) < 2:
            return TargetVectorCluster(
                self.average.add(v1), [(p, v1)] + self.vs, self.n
            )
        cand = TargetVectorCluster(self.average.add(v1), [(p, v1)] + self.vs, self.n)
        if cand.sigma < self.sigma:
            if callback:
                callback()
            return cand
        return self


@dataclass
class SemanticEstimator:
    """SemanticEstimator.scala:11-48.

    central: normalized mean of the initial seeds (fixed);
    target:  top-k cluster (accepting fires the page-promotion callback);
    average: running mean over ALL processed pages;
    factor:  target.normal - average.normal — the discriminative topic
             direction broadcast to the distributed scorer each wave.
    """

    central: SparseVector
    target: TargetVector
    average: AverageVector

    @classmethod
    def create(cls, central: SparseVector, targets: int = 9,
               cluster_policy: str = "target") -> "SemanticEstimator":
        tv_cls = TargetVectorCluster if cluster_policy == "cluster" else TargetVector
        target = tv_cls.empty(targets).add(central)
        return cls(central=central, target=target, average=AverageVector(central))

    def estimate(self, v: SparseVector, callback=None) -> "SemanticEstimator":
        """Fold one (already normalized) page vector in; the callback fires
        iff the page is accepted into the target cluster."""
        return SemanticEstimator(
            central=self.central,
            target=self.target.add(v, callback),
            average=self.average.add(v),
        )

    @property
    def factor(self) -> SparseVector:
        return self.target.normal - self.average.normal

    @property
    def size(self) -> int:
        return len(self.target.vs)

    # -- (de)serialization for checkpointing -----------------------------
    def to_dict(self) -> dict:
        return {
            "central": dict(self.central.items()),
            "target_avg": dict(self.target.average.v.items()),
            "target_vs": [[p, dict(v.items())] for p, v in self.target.vs],
            "target_n": self.target.n,
            "cluster_policy": (
                "cluster" if isinstance(self.target, TargetVectorCluster) else "target"
            ),
            "average": dict(self.average.v.items()),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SemanticEstimator":
        tv_cls = TargetVectorCluster if d["cluster_policy"] == "cluster" else TargetVector
        target = tv_cls(
            AverageVector(SparseVector(d["target_avg"])),
            [(p, SparseVector(v)) for p, v in d["target_vs"]],
            d["target_n"],
        )
        return cls(
            central=SparseVector(d["central"]),
            target=target,
            average=AverageVector(SparseVector(d["average"])),
        )

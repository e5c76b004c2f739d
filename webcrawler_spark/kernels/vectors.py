"""Sparse vector kernel.

Reimplements the observable semantics of the external
``ru.wordmetrix.vector.Vector`` used throughout the reference (declared in
project/Build.scala; unreachable — semantics inferred from call sites, see
SURVEY.md §2.6 row A1):

- keys are arbitrary hashables (word ids, words, link-context features);
- entries whose |value| < accuracy are dropped on construction and after
  every arithmetic op (implicit accuracy threading, Gather.scala:69,
  NetworkEstimator.scala:23);
- ``normal`` = the vector scaled to unit L2 (empty stays empty);
- ``norm`` = L2 length, ``sqr`` = squared L2, ``*`` = dot product.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping


class SparseVector:
    __slots__ = ("d", "accuracy")

    def __init__(
        self,
        items: Mapping | Iterable[tuple[object, float]] = (),
        accuracy: float = 0.0001,
    ):
        if isinstance(items, Mapping):
            items = items.items()
        d = {}
        for k, v in items:
            v = d.get(k, 0.0) + v
            d[k] = v
        self.d = {k: v for k, v in d.items() if abs(v) >= accuracy}
        self.accuracy = accuracy

    # -- arithmetic ------------------------------------------------------
    def __add__(self, other: "SparseVector") -> "SparseVector":
        d = dict(self.d)
        for k, v in other.d.items():
            d[k] = d.get(k, 0.0) + v
        return SparseVector(d, self.accuracy)

    def __sub__(self, other: "SparseVector") -> "SparseVector":
        d = dict(self.d)
        for k, v in other.d.items():
            d[k] = d.get(k, 0.0) - v
        return SparseVector(d, self.accuracy)

    def scale(self, a: float) -> "SparseVector":
        return SparseVector({k: v * a for k, v in self.d.items()}, self.accuracy)

    def dot(self, other: "SparseVector") -> float:
        a, b = self.d, other.d
        if len(b) < len(a):
            a, b = b, a
        return sum(v * b[k] for k, v in a.items() if k in b)

    __mul__ = dot

    # -- norms -----------------------------------------------------------
    @property
    def sqr(self) -> float:
        return sum(v * v for v in self.d.values())

    @property
    def norm(self) -> float:
        return math.sqrt(self.sqr)

    @property
    def normal(self) -> "SparseVector":
        n = self.norm
        if n == 0.0:
            return SparseVector({}, self.accuracy)
        return SparseVector({k: v / n for k, v in self.d.items()}, self.accuracy)

    # -- plumbing ---------------------------------------------------------
    def __eq__(self, other) -> bool:
        return isinstance(other, SparseVector) and self.d == other.d

    def __len__(self) -> int:
        return len(self.d)

    def __bool__(self) -> bool:
        return bool(self.d)

    def __repr__(self) -> str:
        return f"SparseVector({self.d!r})"

    def items(self):
        return self.d.items()

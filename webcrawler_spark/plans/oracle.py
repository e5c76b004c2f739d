"""Sequential reference oracle — the reference's exact crawl semantics
in ~250 lines of pure Python.

This is NOT the engine (the engine is the distributed wave loop in
plans/crawler.py). It is the correctness oracle: with servers=1 the
reference crawl is strictly sequential and deterministic
(SeedQueue.scala:45,106-133), and the Spark engine run with budget=1 must
reproduce this oracle's dispatch order, accepted set and URL-seen set
exactly (the north rule's crawl-order / URL-seen gate).

Ported semantics, by reference file:
- EvaluatePriorityMatrix.scala:166-361 — the 3-phase state machine
  (initialization / targeting / estimating), RevMap first-seen ids (:103-129),
  priority-queue ordering (:81-97), crawl limit (:296), dispatch/eliminate
  (:345-360).
- NetworkEstimator.scala — incremental update (:101-124), full calculate
  (:67-84), drift check (:126-129), eliminate (:131-141), max combine (:90).
- Gather.scala — URL-seen filter on *emitted* links (:126,165-177), host
  allowlist growth (:129-132,153), within-page dedup (:87-92).
- SeedQueue.scala — FIFO of the initial wave keeps driving fetches until it
  drains, even after the estimating transition (exhaust state :69-90); only
  then does the priority queue take over.

Known pinned divergences from a live reference run (SURVEY.md §7):
- the initial-wave shuffle (EvaluatePriorityMatrix.scala:200) uses an
  unseeded scala Random; we use random.Random(cfg.shuffle_seed);
- outlink id assignment order within a page follows first-occurrence order
  in the document (scala iterates an unordered Set).
"""

from __future__ import annotations

import random
from collections import deque
from dataclasses import dataclass, field

from webcrawler_spark.config import CrawlConfig
from webcrawler_spark.kernels import (
    extract_links,
    extract_text,
    link_context,
    term_counts,
)
from webcrawler_spark.kernels.urls import url_host
from webcrawler_spark.kernels.vectors import SparseVector
from webcrawler_spark.plans.estimators import SemanticEstimator


class RevMap:
    """First-seen dense ids from 1 (EvaluatePriorityMatrix.scala:103-129)."""

    def __init__(self):
        self.map: dict = {}
        self.rmap: dict = {}

    def update(self, key) -> int:
        i = self.map.get(key)
        if i is None:
            i = len(self.map) + 1
            self.map[key] = i
            self.rmap[i] = key
        return i

    def update_all(self, keys) -> list[int]:
        return [self.update(k) for k in keys]

    def decode(self, i: int):
        return self.rmap[i]


class NetworkEstimatorOracle:
    """NetworkEstimator.scala — exact port over dict state."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.vectors: dict[int, tuple[SparseVector, set[int]]] = {}
        self.priorities: dict[int, tuple[float, set[int]]] = {}
        self.pfactor = SparseVector({}, cfg.accuracy)

    @staticmethod
    def _combine(ps) -> float:  # NetworkEstimator.scala:90
        return max(ps)

    def update(self, ids: list[int], factor: SparseVector, src: int, v: SparseVector):
        """:101-124 — fold a fetched page in; each outlink priority becomes the
        max over (its parents' + this page's) dots with the given factor."""
        self.vectors[src] = (v, set(ids))
        for dst in ids:
            _, parents = self.priorities.get(dst, (0.0, set()))
            dots = {self.vectors[p][0].dot(factor) for p in parents}
            dots.add(v.dot(factor))
            self.priorities[dst] = (self._combine(dots), parents | {src})

    def calculate(self, factor: SparseVector):
        """:67-84 — full re-score: every outlink of every stored page gets
        max over parents of (parent_vector · factor.normal); parents sets
        are carried over from the existing priorities (direct indexing —
        a missing key would be a semantic divergence, let it raise)."""
        fn = factor.normal
        scores: dict[int, float] = {}
        for src, (vec, outs) in self.vectors.items():
            p = vec.dot(fn)
            for dst in outs:
                scores[dst] = max(scores.get(dst, p), p)
        self.priorities = {
            dst: (p, self.priorities[dst][1]) for dst, p in scores.items()
        }
        self.pfactor = factor

    def check(self, factor_normal: SparseVector):
        """:126-129 — drift-triggered recompute."""
        if factor_normal.normal.dot(self.pfactor) < self.cfg.prioriting:
            self.calculate(factor_normal)

    def eliminate(self, seed: int):
        """:131-141 — dispatched link leaves the frontier and its parents'
        pending-outlink sets."""
        _, parents = self.priorities.pop(seed)
        for x in parents:
            if x in self.vectors:
                vec, outs = self.vectors[x]
                self.vectors[x] = (vec, outs - {seed})

    def queue(self) -> list[tuple[float, int]]:
        """:41-54 + PQ ordering (EvaluatePriorityMatrix.scala:81-97):
        rebuilt from the priorities map; head = (max priority, min id).
        Breadth-first mode: FIFO by id."""
        if self.cfg.use_breadthsearch:
            return sorted(
                ((p, s) for s, (p, _) in self.priorities.items()), key=lambda x: x[1]
            )
        return sorted(
            ((p, s) for s, (p, _) in self.priorities.items()),
            key=lambda x: (-x[0], x[1]),
        )


@dataclass
class EPMOracle:
    """The EvaluatePriorityMatrix state machine, fed GatherSeeds events.

    Feed it exactly the (seed, outlinks, vector) stream Gather would emit
    and it reproduces the reference's request/accept stream. Used directly
    by the scripted-graph test (TestEvaluatePriorityMatrix.scala:36-99)."""

    cfg: CrawlConfig
    events: list[tuple] = field(default_factory=list)
    phase: str = "boot"
    stopped: bool = False

    def __post_init__(self):
        self.ns = 0
        self.index = RevMap()
        self.network = NetworkEstimatorOracle(self.cfg)
        self.sense: SemanticEstimator | None = None
        self._central_acc = SparseVector({}, self.cfg.accuracy)
        self._init_seeds: dict[str, None] = {}
        self._n_init = 0
        self.rng = random.Random(self.cfg.shuffle_seed)

    # -- events ------------------------------------------------------------
    def _emit(self, kind: str, *args):
        self.events.append((kind, *args))

    def start(self, seeds: list[str]):
        self._n_init = len(seeds)
        self.phase = "init"
        for s in seeds:
            self._emit("request", s)

    def gather_seeds(self, seed: str, seeds: list[str], v: SparseVector):
        if self.stopped:
            return
        self.ns += 1
        if self.phase == "init":
            self._emit("sign", seed)
            if self._n_init > 1:
                self._n_init -= 1
                self._central_acc = self._central_acc + v
                for s in seeds:
                    self._init_seeds.setdefault(s, None)
            else:
                for s in seeds:
                    self._init_seeds.setdefault(s, None)
                wave1 = list(self._init_seeds)
                self.rng.shuffle(wave1)
                for s in wave1:
                    self._emit("request", s)
                central = (self._central_acc + v).normal
                self.sense = SemanticEstimator.create(
                    central, self.cfg.targets, self.cfg.cluster_policy
                )
                self.phase = "targeting"
        elif self.phase == "targeting":
            sid = self.index.update(seed)
            ids = self.index.update_all(seeds)
            accepted = []
            self.sense = self.sense.estimate(
                v.normal, lambda: accepted.append(seed)
            )
            for s in accepted:
                self._emit("sign", s)
            # targeting uses the POST-estimate factor (EvaluatePriorityMatrix.scala:243-245)
            self.network.update(ids, self.sense.factor, sid, v)
            if self.sense.factor.dot(self.sense.central) > self.cfg.targeting:
                self.network.calculate(self.sense.factor)
                self.phase = "estimating"
        elif self.phase == "estimating":
            if self.ns > self.cfg.limit:  # EvaluatePriorityMatrix.scala:296
                self.stopped = True
                self._emit("stop")
                return
            sid = self.index.update(seed)
            ids = self.index.update_all(seeds)
            old_factor = self.sense.factor
            accepted = []
            sense1 = self.sense.estimate(v.normal, lambda: accepted.append(seed))
            for s in accepted:
                self._emit("sign", s)
            # check with NEW factor.normal, update with OLD factor
            # (EvaluatePriorityMatrix.scala:329-330)
            self.network.check(sense1.factor.normal)
            self.network.update(ids, old_factor, sid, v)
            self._emit("sample_priority", seed, old_factor.dot(v.normal))
            self.sense = sense1

    def dispatch_next(self) -> str | None:
        """SeedQueueGet in the estimating phase: pop the PQ head, eliminate
        it, return the decoded URL (EvaluatePriorityMatrix.scala:345-360)."""
        if self.phase != "estimating" or self.stopped:
            return None
        q = self.network.queue()
        if not q:
            return None
        _, sid = q[0]
        self.network.eliminate(sid)
        url = self.index.decode(sid)
        self._emit("request", url)
        return url

    # convenience views ----------------------------------------------------
    @property
    def accepted(self) -> list[str]:
        return [e[1] for e in self.events if e[0] == "sign"]

    @property
    def requested(self) -> list[str]:
        return [e[1] for e in self.events if e[0] == "request"]


class GatherOracle:
    """Gather.scala state: emitted-link seen set, growing host allowlist,
    first-seen vocabulary."""

    def __init__(self, cfg: CrawlConfig, allow_hosts: set[str] = ()):  # type: ignore[assignment]
        self.cfg = cfg
        self.seen: set[str] = set()
        self.hosts: set[str] = set(allow_hosts)
        self.vocab = RevMap()

    def page(self, url: str, html) -> dict | None:
        try:
            self.hosts.add(url_host(url))
            links_all = extract_links(
                html, url, allowed_hosts=self.hosts, allhosts=self.cfg.allhosts
            )
            counts = term_counts(html)
            vec = SparseVector(
                {self.vocab.update(w): c for w, c in counts.items()},
                self.cfg.accuracy,
            )
            text = extract_text(html)
            ctx = link_context(html, url)
        except Exception:
            return None  # Gather.scala:178-180 — failures logged and swallowed
        new_links = [l for l in links_all if l not in self.seen]
        self.seen.update(links_all)
        return {
            "url": url,
            "links_new": new_links,
            "links_all": links_all,
            "vec": vec,
            "vec_str": SparseVector(counts, self.cfg.accuracy),
            "text": text,
            "linkctx": ctx,
        }


@dataclass
class CrawlTrace:
    dispatched: list[str] = field(default_factory=list)
    processed: list[str] = field(default_factory=list)
    accepted: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    corpus: dict[str, str] = field(default_factory=dict)
    gml_updates: list[tuple] = field(default_factory=list)  # (url, links_all, vec)
    vocab: dict[str, int] = field(default_factory=dict)
    frontier_final: dict[str, float] = field(default_factory=dict)
    aborted: bool = False


class OracleCrawler:
    """Full sequential crawl: dispatcher + WebGet + Gather + EPM, servers=1."""

    def __init__(self, cfg: CrawlConfig, fetch, allow_hosts: set[str] | None = None):
        self.cfg = cfg
        self.fetch = fetch
        hosts = set(allow_hosts or ())
        hosts.update(h for h in (url_host(s) for s in cfg.seeds) if h)
        self.gather = GatherOracle(cfg, hosts)
        self.epm = EPMOracle(cfg)

    def run(self) -> CrawlTrace:
        trace = CrawlTrace()
        epm, gather = self.epm, self.gather
        epm.start(list(self.cfg.seeds))
        fifo = deque(epm.requested)
        cursor = len(epm.events)

        while not epm.stopped:
            if fifo:
                url = fifo.popleft()
            else:
                url = epm.dispatch_next()
                if url is None:
                    if epm.phase in ("init", "targeting"):
                        trace.aborted = True  # "too little casualties" (:225-229)
                    break
                cursor = len(epm.events)
            trace.dispatched.append(url)
            html = self.fetch(url)
            if html is None:
                continue  # WebGet.scala:57-60 — download fault swallowed
            g = gather.page(url, html)
            if g is None:
                continue
            trace.processed.append(url)
            trace.corpus[url] = g["text"]
            trace.gml_updates.append((url, g["links_all"], g["vec"]))
            epm.gather_seeds(url, g["links_new"], g["vec"])
            # collect any requests the EPM emitted during init->targeting
            for ev in epm.events[cursor:]:
                if ev[0] == "request":
                    fifo.append(ev[1])
            cursor = len(epm.events)

        trace.accepted = epm.accepted
        trace.seen = set(gather.seen)
        trace.vocab = dict(gather.vocab.map)
        trace.frontier_final = {
            epm.index.decode(s): p for s, (p, _) in epm.network.priorities.items()
        }
        return trace

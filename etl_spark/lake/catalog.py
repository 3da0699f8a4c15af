"""Versioned multi-table catalog with atomic cross-table transactions.

A ``LakeTable`` commit (link-created snapshot) is atomic per TABLE; real
pipelines commit correlated writes across tables — a CDC target plus its
derived views and metrics, an A/B table split, medallion layers — that
must become visible TOGETHER or not at all. The Iceberg/Nessie answer is
a CATALOG: one versioned pointer file mapping table name -> (path,
pinned snapshot version). Readers that resolve tables through the
catalog get cross-table snapshot isolation — one catalog version is one
consistent point across every registered table — and a transaction
stages its per-table writes on writable BRANCHES (zero-copy, invisible
to main), publishes them with ``fast_forward``, and flips visibility
with ONE catalog link-create: the catalog commit is the all-or-nothing
point.

Scale shape: a catalog version is O(#tables) driver-side JSON — no data
I/O, no Spark jobs, ever. Staging on branches shares the tables'
content-addressed manifests, so a transaction costs one small JSON per
table commit plus the data files the writes produce anyway. Catalog
commits pin the referenced table snapshots with named refs
(``create_ref``), so ``expire_snapshots`` on a member table can never
reclaim a version the catalog's retained history still points at;
``Catalog.expire`` retires old catalog versions and reconciles the pins.

Failure semantics (documented, tested):

* A transaction that loses the table-level ``fast_forward`` race (a
  concurrent transaction or direct writer advanced the chain) ABORTS:
  tables it already fast-forwarded are compensated with a ``rollback``
  to their pinned state, staged branches are dropped, and
  ``CommitConflict`` is raised — the caller re-runs the transaction on
  the new base (the same optimistic model as ``merge_with_retry``).
* Transactions on DISJOINT table sets never conflict: the losing
  catalog commit rebases onto the winner's pointers and retries
  internally.
* A crash after ``fast_forward`` but before the catalog commit leaves
  stranded commits above the catalog pointer. Catalog readers are
  unaffected (the pointer never moved). The next transaction on that
  table refuses the divergence loudly; ``Catalog.repair`` rolls the
  chain back to the pinned state (a compensating commit — the stranded
  versions stay time-travelable until expiry) and ``Catalog.publish``
  adopts the stray commits instead when they are wanted.
* The diverged refusal is reserved for STABLE strays: a transaction
  staged while a concurrent one published (the pointer moved after this
  transaction captured its base, or is mid-flip for a few ms) raises
  the retryable ``CommitConflict`` instead, so healthy concurrency
  never surfaces the repair-or-publish error. Compensation rollbacks
  may STACK (each loser forks at the previous rollback head); chain
  cleanliness is judged by resolving the rollback references to the
  pinned state, not by one literal op string.

Reference: the reference migrates whole databases table-by-table with
no cross-table atomicity (/root/reference/etl.go's per-table loop,
/root/reference/migrate/migrate.go); this is the lake-native upgrade
that makes the multi-table load transactional.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_spark.lake.table import CommitConflict, LakeTable, _atomic_create

_CAT_DIR = "_catalog"


class _NoopCommit(Exception):
    """Internal veto: the staged entries equal the current entries, so
    the commit is elided (no catalog history growth on quiet ticks)."""
_NAME_RE = re.compile(r"[A-Za-z0-9._-]+")
_ROLLBACK_RE = re.compile(r"rollback\((\d+)\)")


def _rolls_back_to(t: "LakeTable", head: int, pinned: int) -> bool:
    """True when ``head``'s STATE provably equals snapshot ``pinned``'s:
    the head is a rollback whose target chain (rollbacks may STACK —
    each compensated transaction forks at the previous rollback head and
    compensates with a rollback of THAT version) resolves to ``pinned``.
    rollback(x) restores x's state and state(rollback(y)) == state(y),
    so following the references proves state equality."""
    v = head
    seen: set[int] = set()
    while v != pinned and v not in seen:
        seen.add(v)
        m = _ROLLBACK_RE.fullmatch(t.snapshot(v, buckets=set()).op)
        if not m:
            return False
        v = int(m.group(1))
    return v == pinned


class Catalog:
    """Versioned name -> (path, snapshot version) pointer store."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._dir = os.path.join(self.path, _CAT_DIR)
        # ref-name prefix unique to this catalog: two catalogs referencing
        # the same table must not reconcile away each other's pins
        self._tag = hashlib.sha1(self.path.encode()).hexdigest()[:8]

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, path: str) -> "Catalog":
        cat = cls(spark, path)
        if os.path.isdir(cat._dir):
            raise FileExistsError(f"catalog already exists at {path}")
        os.makedirs(cat._dir)
        cat._commit_at(0, {}, op="create")
        return cat

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Catalog":
        cat = cls(spark, path)
        if cat.current_version() is None:
            raise FileNotFoundError(f"no catalog at {path}")
        return cat

    @classmethod
    def exists(cls, spark: SparkSession, path: str) -> bool:
        return cls(spark, path).current_version() is not None

    # ------------------------------------------------------------- versions
    def _v_path(self, v: int) -> str:
        return os.path.join(self._dir, f"cat-v{v:08d}.json")

    def current_version(self) -> int | None:
        if not os.path.isdir(self._dir):
            return None
        vs = [
            int(n[5:-5])
            for n in os.listdir(self._dir)
            if n.startswith("cat-v") and n.endswith(".json")
        ]
        return max(vs) if vs else None

    def _read_version(self, v: int) -> dict[str, Any]:
        with open(self._v_path(v)) as fh:
            return json.load(fh)

    def entries(
        self, version: "int | str | None" = None
    ) -> dict[str, dict[str, Any]]:
        """name -> {"path": ..., "version": ...} at a catalog version
        (default: current). A string version is a TAG name."""
        if isinstance(version, str):
            version = self.resolve_tag(version)
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no catalog at {self.path}")
        return dict(self._read_version(v)["tables"])

    # ----------------------------------------------------------------- tags
    def _tag_path(self, name: str) -> str:
        return os.path.join(self._dir, f"tag-{name}.json")

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin a catalog version under a NAME (Nessie tag semantics for
        the whole catalog): ``read(table, catalog_version="release-1")``
        then reads every member at one named consistent cut, and
        ``expire`` retains the tagged version (and its table-side pins)
        until ``drop_tag``. One atomic O_EXCL file; O(1) metadata."""
        if not _NAME_RE.fullmatch(name):
            raise ValueError(f"tag name {name!r} must match [A-Za-z0-9._-]+")
        v = self.current_version() if version is None else int(version)
        if v is None or not os.path.exists(self._v_path(v)):
            raise FileNotFoundError(
                f"catalog version {v} does not exist (expired?)"
            )
        _atomic_create(
            self._tag_path(name),
            json.dumps({"name": name, "version": v, "ts": time.time()}),
        )
        # validate-after-create, same interleave discipline as
        # LakeTable.create_ref: a concurrent expire may have listed tags
        # before this one became visible — exactly one winner
        if not os.path.exists(self._v_path(v)):
            os.remove(self._tag_path(name))
            raise FileNotFoundError(
                f"catalog version {v} was expired while tagging it"
            )
        return v

    def drop_tag(self, name: str) -> None:
        p = self._tag_path(name)
        if not os.path.exists(p):
            raise FileNotFoundError(f"no catalog tag named {name!r}")
        os.remove(p)

    def tags(self) -> dict[str, int]:
        """tag name -> pinned catalog version."""
        out = {}
        for n in sorted(os.listdir(self._dir)):
            if n.startswith("tag-") and n.endswith(".json"):
                with open(os.path.join(self._dir, n)) as fh:
                    t = json.load(fh)
                out[t["name"]] = int(t["version"])
        return out

    def resolve_tag(self, name: str) -> int:
        t = self.tags()
        if name not in t:
            raise FileNotFoundError(f"no catalog tag named {name!r}")
        return t[name]

    def version_as_of(self, ts: float) -> int:
        """Newest catalog version committed at or before unix-seconds
        ``ts`` (``TIMESTAMP AS OF`` over the WHOLE catalog): reading
        every table at ``entries(version_as_of(t))`` reproduces the
        cross-table-consistent state visible at ``t`` — per-table
        ``LakeTable.version_as_of`` cannot do that, since a table commit
        may have been visible on its chain but not yet published to the
        catalog at ``t``. Driver-side metadata walk over retained
        catalog versions (expired ones are skipped)."""
        best: int | None = None
        cur = self.current_version()
        for v in range((cur if cur is not None else -1) + 1):
            if not os.path.exists(self._v_path(v)):
                continue
            if self._read_version(v)["ts"] <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no catalog version at or before ts={ts} at {self.path}"
            )
        return best

    def history(self) -> list[dict[str, Any]]:
        cur = self.current_version()
        out = []
        for v in range((cur if cur is not None else -1) + 1):
            if os.path.exists(self._v_path(v)):
                out.append(self._read_version(v))
        return out

    def _commit_at(
        self, version: int, tables: dict[str, dict[str, Any]], op: str
    ) -> int:
        payload = json.dumps(
            {
                "version": version,
                "ts": time.time(),
                "op": op,
                "tables": tables,
            },
            indent=1,
        )
        try:
            _atomic_create(self._v_path(version), payload)
        except FileExistsError as e:
            raise CommitConflict(
                f"catalog version {version} already committed at {self.path}"
            ) from e
        return version

    # ----------------------------------------------------------------- pins
    def _ref_name(self, table_version: int) -> str:
        return f"cat{self._tag}-v{table_version}"

    def _pin(self, table: LakeTable, table_version: int) -> None:
        # ref name encodes the version 1:1, so an EEXIST from a concurrent
        # pinner is by construction the same pin — already done
        try:
            table.create_ref(self._ref_name(table_version), table_version)
        except FileExistsError:
            pass

    # ------------------------------------------------------------- pointers
    def register(
        self, name: str, table: "LakeTable | str", version: int | None = None
    ) -> int:
        """Add ``name`` -> table pointer at the table's current (or given)
        snapshot version. Returns the new catalog version."""
        if not _NAME_RE.fullmatch(name):
            raise ValueError(f"table name {name!r} must match [A-Za-z0-9._-]+")
        t = (
            table
            if isinstance(table, LakeTable)
            else LakeTable.load(self.spark, table)
        )
        tv = t.current_version() if version is None else version
        self._pin(t, tv)
        entry = {"path": t.path, "version": int(tv)}

        def _apply(e: dict[str, dict[str, Any]]) -> None:
            if name in e:
                raise FileExistsError(
                    f"table {name!r} already registered in catalog"
                )
            e[name] = entry

        return self._rebase_commit(_apply, op=f"register({name})")

    def drop(self, name: str) -> int:
        """Remove the pointer (history keeps it; ``expire`` releases the
        table-side pins once no retained catalog version references it)."""

        def _apply(e: dict[str, dict[str, Any]]) -> None:
            if name not in e:
                raise FileNotFoundError(f"no table {name!r} in catalog")
            del e[name]

        return self._rebase_commit(_apply, op=f"drop({name})")

    def publish(self, name: str, version: int | None = None) -> int:
        """Point ``name`` at the table's current (or given) snapshot —
        adopt commits made directly on the table chain outside a
        transaction (single-table pointer advance, Iceberg's plain
        commit shape)."""
        e0 = self.entries()
        if name not in e0:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        t = LakeTable.load(self.spark, e0[name]["path"])
        tv = t.current_version() if version is None else version
        if int(e0[name]["version"]) == int(tv):
            # pointer already there: no-op publishes commit NOTHING (the
            # engine-wide no-op elision contract) — a publish CADENCE on
            # a quiet stream never grows catalog history
            return self.current_version()
        self._pin(t, tv)

        def _apply(e: dict[str, dict[str, Any]]) -> None:
            if name not in e:
                raise FileNotFoundError(f"table {name!r} dropped concurrently")
            e[name] = {**e[name], "version": int(tv)}

        return self._rebase_commit(_apply, op=f"publish({name})")

    def publish_many(
        self,
        updates: dict[str, tuple["LakeTable", int]],
        *,
        drop: "tuple[str, ...] | list[str]" = (),
        op: str = "publish_many",
    ) -> int | None:
        """Flip MANY pointers (and optionally add/remove entries) in ONE
        catalog commit — the replication-flip primitive: a replicator
        applies each table's pending change-feed windows to the replica
        tables' chains (heads run ahead of the catalog, invisible to
        catalog readers), then publishes the whole consistent pointer
        set atomically, so readers jump between cross-table-consistent
        points and never see a half-applied tick.

        ``updates`` maps name -> (table handle, snapshot version); names
        not yet registered are added (registration + flip in the same
        commit — a bootstrapped table never appears empty). ``drop``
        removes entries. Pins land before the commit (same order as
        ``publish``). No-op elision: if nothing would change, commits
        NOTHING and returns the current version. Last-write-wins on the
        pointers it touches — meant for a catalog the caller owns (a
        replica); unrelated entries rebase as usual."""
        for name, (t, v) in updates.items():
            if not _NAME_RE.fullmatch(name):
                raise ValueError(
                    f"table name {name!r} must match [A-Za-z0-9._-]+"
                )
            self._pin(t, int(v))
        drops = set(drop)

        def _apply(e: dict[str, dict[str, Any]]) -> None:
            before = dict(e)
            for name, (t, v) in updates.items():
                e[name] = {"path": t.path, "version": int(v)}
            for name in drops:
                e.pop(name, None)
            if e == before:
                raise _NoopCommit()

        try:
            return self._rebase_commit(_apply, op=op)
        except _NoopCommit:
            return self.current_version()

    def _rebase_commit(self, apply_fn, op: str, attempts: int = 20) -> int:
        """Optimistic catalog commit: re-read + re-apply on conflict.
        ``apply_fn`` mutates the entries dict in place (and raises to
        veto); pointer-level conflicts are the CALLER's job to detect —
        this loop only rebases the unrelated entries."""
        for _ in range(attempts):
            base = self.current_version()
            if base is None:
                raise FileNotFoundError(f"no catalog at {self.path}")
            e = self.entries(base)
            apply_fn(e)
            try:
                return self._commit_at(base + 1, e, op=op)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"catalog at {self.path} kept advancing for {attempts} attempts"
        )

    # ---------------------------------------------------------------- reads
    def pinned_version(
        self, name: str, catalog_version: "int | str | None" = None
    ) -> int:
        e = self.entries(catalog_version)
        if name not in e:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        return int(e[name]["version"])

    def table(self, name: str) -> LakeTable:
        """LIVE (head) handle — for maintenance ops (compact, expire).
        For isolated reads use ``read``; for writes use ``transaction``."""
        e = self.entries()
        if name not in e:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        return LakeTable.load(self.spark, e[name]["path"])

    def read(
        self, name: str, catalog_version: "int | str | None" = None
    ) -> DataFrame:
        """Read ``name`` pinned at the catalog's recorded snapshot. Two
        ``read`` calls with the same ``catalog_version`` (or within one
        catalog head, captured once) are a CONSISTENT cross-table view.
        A string ``catalog_version`` is a TAG name (``create_tag``)."""
        e = self.entries(catalog_version)
        if name not in e:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        t = LakeTable.load(self.spark, e[name]["path"])
        return t.read(version=int(e[name]["version"]))

    def sql_views(
        self, prefix: str = "", catalog_version: "int | str | None" = None
    ) -> list[str]:
        """Register every table's PINNED read as a temp view
        (``<prefix><name>``) so ``spark.sql`` queries join the whole
        catalog at ONE consistent point — the SQL face of cross-table
        snapshot isolation. Returns the view names."""
        e = self.entries(catalog_version)
        names = []
        for name in sorted(e):
            vname = f"{prefix}{name}"
            self.read(name, catalog_version).createOrReplaceTempView(vname)
            names.append(vname)
        return names

    # --------------------------------------------------------- transactions
    def transaction(self) -> "CatalogTransaction":
        return CatalogTransaction(self)

    def repair(self, name: str) -> int | None:
        """Compensate stranded commits above the catalog pointer (a crash
        between ``fast_forward`` and the catalog commit): roll the table
        chain back to the pinned state as a NEW commit. The stranded
        versions stay time-travelable until ``expire_snapshots``.
        Returns the rollback commit's version (None if nothing to do)."""
        e = self.entries()
        if name not in e:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        t = LakeTable.load(self.spark, e[name]["path"])
        pinned = int(e[name]["version"])
        head = t.current_version()
        if head == pinned or _rolls_back_to(t, head, pinned):
            return None  # already clean (possibly via an earlier repair)
        return t.rollback(pinned).version

    # -------------------------------------------------------------- expiry
    def expire(self, keep_last: int = 5) -> dict[str, int]:
        """Retire catalog versions beyond the ``keep_last`` newest, then
        reconcile table-side pins: every ref this catalog owns whose
        pinned version no retained catalog version references is
        dropped (the table's own ``expire_snapshots`` may then reclaim
        it). Driver-side metadata only.

        Concurrency: a transaction pins its new table versions BEFORE
        its catalog commit, so an expire racing an in-flight commit
        could reconcile such a pin away as unreferenced. A final healing
        pass re-reads the version set (including any committed during
        this call) and re-creates every pin a retained version needs
        (``_pin`` is idempotent), shrinking that window to nothing for
        any transaction whose catalog commit lands before the re-read;
        run ``expire`` from the catalog owner's maintenance cadence, not
        concurrently with a storm of writers."""
        cur = self.current_version()
        if cur is None:
            raise FileNotFoundError(f"no catalog at {self.path}")
        versions = sorted(
            int(n[5:-5])
            for n in os.listdir(self._dir)
            if n.startswith("cat-v") and n.endswith(".json")
        )
        keep = set(versions[-max(1, keep_last):])
        # tagged versions are retained — with their table-side pins (the
        # `needed` map below is computed from `keep`) — until drop_tag
        keep |= {v for v in self.tags().values() if v in set(versions)}
        # reconcile the pins of EVERY path any version (retained OR about
        # to be removed) references — a table dropped from all retained
        # versions would otherwise keep its refs forever, blocking that
        # table's expire_snapshots from ever reclaiming the snapshots
        all_paths: set[str] = set()
        for v in versions:
            for ent in self._read_version(v)["tables"].values():
                all_paths.add(ent["path"])
        removed = 0
        for v in versions:
            if v not in keep:
                os.remove(self._v_path(v))
                removed += 1
        # live pins: (table path -> set of pinned versions) across survivors
        needed: dict[str, set[int]] = {}
        for v in sorted(keep):
            for ent in self._read_version(v)["tables"].values():
                needed.setdefault(ent["path"], set()).add(int(ent["version"]))
        dropped_refs = 0
        prefix = f"cat{self._tag}-v"
        for path in sorted(all_paths):
            try:
                t = LakeTable.load(self.spark, path)
            except FileNotFoundError:
                continue  # table deleted from disk — nothing left to unpin
            versions_needed = needed.get(path, set())
            for ref, rv in t.refs().items():
                if ref.startswith(prefix) and rv not in versions_needed:
                    t.drop_ref(ref)
                    dropped_refs += 1
        # healing pass: re-read the live version set (a transaction may
        # have committed mid-expire) and restore every pin a retained
        # version needs — idempotent, O(#tables) driver reads
        cur2 = self.current_version()
        for v in range((cur2 if cur2 is not None else -1) + 1):
            if not os.path.exists(self._v_path(v)):
                continue
            for ent in self._read_version(v)["tables"].values():
                try:
                    t = LakeTable.load(self.spark, ent["path"])
                except FileNotFoundError:
                    continue
                self._pin(t, int(ent["version"]))
        return {"removed_versions": removed, "dropped_refs": dropped_refs}


class CatalogTransaction:
    """Stage writes to several catalog tables; commit them atomically.

    Usage::

        txn = cat.transaction()
        a = txn.table("events")      # a writable BRANCH handle
        b = txn.table("metrics")
        a.merge(batch); b.append(rows)
        txn.commit()                 # one catalog link-create = visibility

    ``txn.table`` forks a branch at the catalog-PINNED version, so the
    transaction is isolated from anything unpublished on the chain; the
    full ``LakeTable`` write surface works on the handle. ``commit``
    fast-forwards every touched branch (table-level atomicity) and then
    flips the catalog pointer set in one link-create (cross-table
    atomicity). On any fast-forward race the transaction compensates and
    raises ``CommitConflict`` — re-run it on the new base. Use as a
    context manager to auto-``abort`` on exceptions."""

    def __init__(self, cat: Catalog):
        self._cat = cat
        self._base_entries = cat.entries()
        self._id = uuid.uuid4().hex[:8]
        self._branch = f"txn-{self._id}"
        # name -> (main handle, branch handle, fork version)
        self._tables: dict[str, tuple[LakeTable, LakeTable, int]] = {}
        self._done = False

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if not self._done:
            self.abort()

    def table(self, name: str) -> LakeTable:
        if self._done:
            raise RuntimeError("transaction already finished")
        if name in self._tables:
            return self._tables[name][1]
        if name not in self._base_entries:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        ent = self._base_entries[name]
        t = LakeTable.load(self._cat.spark, ent["path"])
        pinned = int(ent["version"])
        fork = pinned
        # distinguish three head-ahead-of-pin shapes:
        #   1. a repair/compensation rollback whose STATE is the pinned
        #      snapshot -> fork at the head so fast_forward can succeed;
        #   2. a CONCURRENT transaction/publish that advanced the catalog
        #      after this transaction captured its base (or is mid-commit
        #      for a few ms between fast_forward and the catalog flip) ->
        #      CommitConflict, the retryable answer (a fresh transaction
        #      sees a consistent base). The short grace re-reads below
        #      absorb the mid-commit window;
        #   3. STABLE stray commits with an unmoved pointer (a crashed
        #      transaction, an out-of-band writer) -> refuse loudly with
        #      the recovery spelled out.
        head = t.current_version()
        if head != pinned:
            for _ in range(3):
                if _rolls_back_to(t, head, pinned):
                    fork = head
                    break
                cur = self._cat.entries().get(name)
                if cur is None or int(cur["version"]) != pinned:
                    raise CommitConflict(
                        f"catalog pointer for {name!r} moved from "
                        f"v{pinned} since this transaction began — "
                        "re-run it on the new base"
                    )
                time.sleep(0.05)
                head = t.current_version()
                if head == pinned:
                    break
            else:
                raise RuntimeError(
                    f"table {name!r} chain (v{head}) diverged from its "
                    f"catalog pointer (v{pinned}) — Catalog.publish() to "
                    "adopt the stray commits or Catalog.repair() to roll "
                    "them back"
                )
        br = t.create_branch(self._branch, version=fork)
        self._tables[name] = (t, br, fork)
        return br

    def abort(self) -> None:
        """Drop every staged branch — main chains and catalog untouched
        (nothing was fast-forwarded); branch-only files become orphans
        for ``vacuum``."""
        for t, _, _ in self._tables.values():
            try:
                t.drop_branch(self._branch)
            except FileNotFoundError:
                pass
        self._done = True

    def commit(self) -> int | None:
        """Publish. Returns the new catalog version (None when no table
        actually changed — an all-no-op transaction commits NOTHING,
        same contract as the table-level no-op elision)."""
        if self._done:
            raise RuntimeError("transaction already finished")
        published: dict[str, int] = {}
        forwarded: list[tuple[str, LakeTable, int]] = []
        try:
            for name, (t, br, fork) in self._tables.items():
                if br.current_version() == fork:
                    t.drop_branch(self._branch)  # touched but wrote nothing
                    continue
                snap = t.fast_forward(self._branch)
                forwarded.append((name, t, fork))
                t.drop_branch(self._branch)
                published[name] = snap.version
        except CommitConflict:
            # a racer advanced some chain mid-publish: compensate the
            # tables already forwarded (rollback to their fork STATE — a
            # new commit; catalog pointers never moved so readers are
            # unaffected), drop what's left staged, surface the conflict
            for _, t, fork in forwarded:
                t.rollback(fork)
            for name, (t, _, _) in self._tables.items():
                try:
                    t.drop_branch(self._branch)
                except FileNotFoundError:
                    pass
            self._done = True
            raise
        if not published:
            self._done = True
            return None
        for name, v in published.items():
            self._cat._pin(self._tables[name][0], v)

        base = self._base_entries

        def _apply(e: dict[str, dict[str, Any]]) -> None:
            for name, v in published.items():
                if name not in e or int(e[name]["version"]) != int(
                    base[name]["version"]
                ):
                    raise CommitConflict(
                        f"catalog pointer for {name!r} moved during the "
                        "transaction"
                    )
                e[name] = {**e[name], "version": int(v)}

        try:
            out = self._cat._rebase_commit(_apply, op=f"txn({self._id})")
        except CommitConflict:
            # catalog-level loss (pointer moved by a publish() that didn't
            # touch the chain): compensate the forwarded chains too
            for _, t, fork in forwarded:
                t.rollback(fork)
            self._done = True
            raise
        self._done = True
        return out

"""Optional positional sidecar: phrase verify in O(phrase postings).

Without it, phrase search verifies candidates by re-reading and
re-tokenizing the candidate documents from the index's recorded input
lineage (pipelines/query.py:_verify_phrase) — cost bounded by the rarest
term's df but paid in corpus bytes.  The sidecar stores, per indexed term
and document, the term's POSITIONS in the document's index-mode token
stream, so verify becomes a pruned read of the phrase terms' position
lists plus one vectorized adjacency chain — no corpus re-read.  (The
reference has no positional index or phrase search at all; this is a
beyond-reference operator, kept OPT-IN because the sidecar is the size of
the full token stream.)

Layout: ``<index>/positions/pos-{salt:06d}-{doc_lo:012d}-{doc_hi:012d}
.parquet`` — rows ``(term, doc_id, positions: list<int32>)`` sorted by
(term, doc_id), small row groups so the parquet footer's per-group
term min/max statistics give term-range pruning at query time (the same
footer trick as the df parts and the streamed ConvResolver).

Build shape (NO shuffle): one task per salt.  A salt is a contiguous
doc-id range = contiguous conversation range, so each task re-reads only
the source files overlapping its conv range (footer-stats pruned),
tokenizes with positions (vectorized lexsort grouping, no per-token
Python), sorts its salt, and writes ONE file atomically.  Across all
salts the corpus is read exactly once.  Per-task memory is one salt's
token stream — bounded by ``range_size`` docs, the same unit the SPIMI
merge already holds.

Resume / append: each file's parquet footer records a hash of the salt's
pruned source lineage; a re-run keeps files whose range AND lineage hash
still match, deletes the rest, and rebuilds only what changed.  After an
``append_index`` only the old tail salt's range and the new salts differ,
so the refresh is O(delta).  ``positions/_SUCCESS`` carries the full
index fingerprint; serving treats a mismatched marker as "no sidecar"
(stale positions are never silently used).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..state.manifest import (
    atomic_write_bytes,
    mark_stage_complete,
    stage_complete,
)
from ..textproc import TokenPipeline

POS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("positions", pa.list_(pa.int32())),
    ]
)
POS_ROW_GROUP = 16384
_LINEAGE_META = b"pos_lineage"


def prune_paths_by_conv(
    paths: list[str], lo: str, hi: str
) -> list[str]:
    """Files whose conv_id range (parquet footer row-group statistics)
    overlaps [lo, hi] — file-level predicate pushdown for a conversation-
    range read.  Unreadable statistics keep the file (correctness first).
    Shared by the phrase verify re-read and the positions build."""
    kept = []
    for p in paths:
        try:
            md = pq.read_metadata(p)
            idx = md.schema.names.index("conv_id")
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no stats")
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            if fmax < lo or fmin > hi:
                continue
        except Exception:
            pass
        kept.append(p)
    return kept


def index_fingerprint(out_dir: str | Path) -> str:
    """Fingerprint of the built index a positions sidecar belongs to:
    the identity-bearing stats.json fields (corpus size, postings count,
    mode, salt layout, input lineage)."""
    stats = json.loads((Path(out_dir) / "stats.json").read_text())
    key = {
        k: stats[k]
        for k in (
            "N",
            "n_postings",
            "total_doc_len",
            "mode",
            "range_size",
            "lineage",
        )
    }
    return hashlib.sha256(
        json.dumps(key, sort_keys=True).encode()
    ).hexdigest()[:16]


def _salt_items(N: int, range_size: int) -> list[dict]:
    items = []
    for salt in range(-(-N // range_size)):
        lo = salt * range_size
        hi = min((salt + 1) * range_size, N) - 1
        items.append({"salt": salt, "doc_lo": lo, "doc_hi": hi})
    return items


def _pos_name(salt: int, lo: int, hi: int) -> str:
    return f"pos-{salt:06d}-{lo:012d}-{hi:012d}.parquet"


def positions_batch_table(
    doc_ids: np.ndarray, texts: list[str], pipe: TokenPipeline
) -> pa.Table:
    """(doc_id, text) rows -> (term, doc_id, positions) rows, sorted by
    (term, doc_id).  Tokenization is per doc (the required compute); the
    grouping into per-(term, doc) position lists is one vectorized lexsort
    over the batch's flattened token stream."""
    flat: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, tx in enumerate(texts):
        toks = pipe(tx)
        flat.extend(toks)
        lens[i] = len(toks)
    total = len(flat)
    if total == 0:
        return POS_SCHEMA.empty_table()
    terms = np.array(flat, dtype=np.str_)
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    pos_within = (
        np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    )
    # stable 3-key sort: term (primary), doc (secondary), position (last) —
    # so positions come out ascending inside each (term, doc) group
    order = np.lexsort((pos_within, doc_of, terms))
    st, sd, sp = terms[order], doc_of[order], pos_within[order]
    new_grp = np.flatnonzero((st[1:] != st[:-1]) | (sd[1:] != sd[:-1])) + 1
    offs = np.concatenate(([0], new_grp, [total]))
    heads = offs[:-1]
    return pa.table(
        {
            "term": pa.array(st[heads], type=pa.string()),
            "doc_id": pa.array(
                np.asarray(doc_ids, dtype=np.int64)[sd[heads]],
                type=pa.int64(),
            ),
            "positions": pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(sp, type=pa.int32()),
            ),
        }
    )


def _build_salt(
    item: dict,
    *,
    pos_dir: str,
    convs_path: str,
    source_paths: list[str],
    mode: str,
    row_group_size: int,
    offsets_in_memory: bool | None = None,
) -> dict:
    """One salt's positions file: conv-pruned source read -> tokenize with
    positions -> salt-wide (term, doc_id) sort -> atomic parquet write.
    Skips (or replaces) an existing file by comparing its recorded pruned-
    lineage hash."""
    from ..stages.convmap import ConvResolver
    from ..stages.docids import assign_doc_ids

    salt, lo, hi = item["salt"], item["doc_lo"], item["doc_hi"]
    path = Path(pos_dir) / _pos_name(salt, lo, hi)
    res = ConvResolver(convs_path, in_memory=offsets_in_memory)
    need = res.convs_for(np.arange(lo, hi + 1, dtype=np.int64))
    pair = res.pair_for_convs(need)
    files = prune_paths_by_conv(source_paths, need[0], need[-1])
    # (size, mtime_ns) per source file: an in-place edit that preserves
    # size would otherwise keep serving a stale positions file forever
    lineage = hashlib.sha256(
        json.dumps(
            [
                [p, st.st_size, st.st_mtime_ns]
                for p in sorted(files)
                for st in (Path(p).stat(),)
            ]
        ).encode()
    ).hexdigest()[:16]
    if path.exists():
        try:
            md = pq.read_metadata(path).metadata or {}
            if md.get(_LINEAGE_META, b"").decode() == lineage:
                return {
                    "salt": salt,
                    "n_rows": pq.read_metadata(path).num_rows,
                    "skipped": True,
                }
        except Exception:
            pass
        path.unlink()  # stale content under a matching name: rebuild
    pipe = TokenPipeline(mode)
    need_set = pa.array(need, type=pa.string())
    parts: list[pa.Table] = []
    for p in files:
        t = pq.read_table(p, columns=["conv_id", "turn_idx", "text"])
        t = t.filter(pc.is_in(t["conv_id"], value_set=need_set))
        if t.num_rows == 0:
            continue
        t = assign_doc_ids(t, offsets_ref=pair)
        d = t["doc_id"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d <= hi)))
        if t.num_rows == 0:
            continue
        parts.append(
            positions_batch_table(
                t["doc_id"].to_numpy(), t["text"].to_pylist(), pipe
            )
        )
    tbl = (
        pa.concat_tables(parts).sort_by(
            [("term", "ascending"), ("doc_id", "ascending")]
        )
        if parts
        else POS_SCHEMA.empty_table()
    )
    tbl = tbl.replace_schema_metadata({_LINEAGE_META: lineage.encode()})
    atomic_write_bytes(
        path,
        lambda tmp: pq.write_table(tbl, tmp, row_group_size=row_group_size),
    )
    return {"salt": salt, "n_rows": tbl.num_rows, "skipped": False}


def build_positions(
    out_dir: str | Path,
    *,
    row_group_size: int = POS_ROW_GROUP,
    offsets_in_memory: bool | None = None,
) -> dict:
    """Build (or incrementally refresh) the positional sidecar for a built
    index.  Idempotent and resumable: per-salt files validate their own
    lineage, the _SUCCESS marker validates the whole index fingerprint.
    ``offsets_in_memory`` forwards to each task's ConvResolver (None=auto;
    False forces the footer-pruned streamed mode — the 100-TB path where no
    task holds a conversation-count-sized table).  Returns the marker
    payload."""
    from .index_build import IndexMeta

    meta = IndexMeta.load(out_dir)
    out = Path(out_dir)
    pos_dir = out / "positions"
    fp = index_fingerprint(out)
    marker = stage_complete(pos_dir, fp)
    if marker is not None:
        return marker
    pos_dir.mkdir(parents=True, exist_ok=True)
    items = _salt_items(meta.N, meta.range_size)
    expected = {
        _pos_name(i["salt"], i["doc_lo"], i["doc_hi"]) for i in items
    }
    for f in pos_dir.glob("pos-*.parquet"):
        if f.name not in expected:
            f.unlink()  # range changed (append moved the tail boundary)
    stale_marker = pos_dir / "_SUCCESS"
    if stale_marker.exists():
        stale_marker.unlink()
    stats = json.loads((out / "stats.json").read_text())
    source_paths = [ln["path"] for ln in stats["lineage"]]
    kwargs = {
        "pos_dir": str(pos_dir),
        "convs_path": str(out / "convs.parquet"),
        "source_paths": source_paths,
        "mode": meta.mode,
        "row_group_size": row_group_size,
        "offsets_in_memory": offsets_in_memory,
    }
    if len(items) == 1:  # single salt: no point spinning up a Ray stage
        rows = [_build_salt(items[0], **kwargs)]
    else:
        rows = ray.data.from_items(items).map(
            lambda item: _build_salt(item, **kwargs)
        ).take_all()  # bounded: one manifest row per salt
    return mark_stage_complete(
        pos_dir,
        fp,
        n_salts=len(rows),
        n_rows=int(sum(r["n_rows"] for r in rows)),
        n_skipped=int(sum(1 for r in rows if r["skipped"])),
        row_group_size=row_group_size,
    )


# ---------------------------------------------------------------------------
# query-side: pruned position reads + vectorized adjacency chain


def positions_available(out_dir: str | Path) -> bool:
    """True iff a positions sidecar exists AND matches the index's current
    fingerprint (a stale sidecar — e.g. after an append without a refresh —
    reads as absent, never as silently-wrong; staleness is logged so the
    auto-mode fallback to the re-tokenize verify is visible)."""
    out = Path(out_dir)
    if not (out / "positions" / "_SUCCESS").exists():
        return False
    if stage_complete(out / "positions", index_fingerprint(out)) is None:
        import logging

        logging.getLogger(__name__).warning(
            "positional sidecar under %s is STALE (index changed since it "
            "was built) — phrase verify falls back to the candidate "
            "re-tokenize; run build_positions(out_dir) to refresh",
            out / "positions",
        )
        return False
    return True


def _read_term_positions(
    path: str, terms: list[str], cand_lo: int, cand_hi: int
) -> pa.Table:
    """One salt file's rows for the phrase terms, row-group-pruned by the
    footer's term min/max statistics (missing stats keep the group)."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    t_idx = md.schema.names.index("term")
    keep_rgs = []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(t_idx).statistics
        if st is None or not st.has_min_max:
            keep_rgs.append(rg)
            continue
        if any(st.min <= t <= st.max for t in terms):
            keep_rgs.append(rg)
    if not keep_rgs:
        return POS_SCHEMA.empty_table()
    # strip the per-file lineage metadata so tables concat across files
    t = pf.read_row_groups(keep_rgs).replace_schema_metadata(None)
    mask = pc.is_in(t["term"], value_set=pa.array(terms, type=pa.string()))
    t = t.filter(mask)
    d = t["doc_id"].to_numpy()
    return t.filter(pa.array((d >= cand_lo) & (d <= cand_hi)))


_POS_MASK = np.int64(0xFFFFFFFF)


def chain_spans(
    term_keys_seq: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy earliest-successor chains across per-term SORTED key arrays
    (key = ``rank << 32 | pos``): for every occurrence of term 0, follow
    each subsequent term to its smallest strictly-later position in the
    same doc.  Returns the (start_keys, end_keys) of chains that complete.

    For a fixed start, taking the earliest valid successor at every step
    minimizes the end position (the successor map is monotone), so the
    greedy end is the MINIMAL span over all ordered occurrences from that
    start — which makes ``span <= bound`` an exact existence test for the
    sloppy-phrase predicate."""
    S_start = term_keys_seq[0]
    S_cur = S_start
    empty = np.empty(0, dtype=np.int64)
    for keys in term_keys_seq[1:]:
        if S_cur.size == 0 or keys.size == 0:
            return empty, empty
        i = np.searchsorted(keys, S_cur + 1, side="left")
        ok = i < keys.size
        succ = keys[np.minimum(i, keys.size - 1)]
        ok &= (succ >> np.int64(32)) == (S_cur >> np.int64(32))
        S_start, S_cur = S_start[ok], succ[ok]
    return S_start, S_cur


def _match_cand_docs(
    got: pa.Table, cand: np.ndarray, terms: list[str], slop: int
) -> np.ndarray:
    """Candidate docs in ``cand`` (sorted) whose positions in ``got`` hold
    ``terms`` as a contiguous (``slop=0``) or ordered-sloppy run.  Pure
    local kernel — chains never cross documents, so it is exact over any
    doc-complete subset of the candidates (e.g. one salt's slice)."""
    # keep only true candidates (the file-level filter was a range filter)
    d = got["doc_id"].to_numpy()
    idx_safe = np.clip(np.searchsorted(cand, d), 0, cand.size - 1)
    got = got.filter(pa.array(cand[idx_safe] == d))
    uniq_terms = sorted(set(terms))
    term_keys: dict[str, np.ndarray] = {}
    d = got["doc_id"].to_numpy()
    ranks = np.searchsorted(cand, d).astype(np.int64)
    plist = got["positions"].combine_chunks()
    flat = plist.values.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = plist.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    row_lens = np.diff(offs)
    row_rank = np.repeat(ranks, row_lens)
    all_keys = (row_rank << np.int64(32)) | flat
    t_arr = got["term"].to_numpy(zero_copy_only=False)
    row_term = np.repeat(t_arr, row_lens)
    for t in uniq_terms:
        term_keys[t] = np.sort(all_keys[row_term == t])
    empty = np.empty(0, dtype=np.int64)
    if slop > 0:
        starts, ends = chain_spans([term_keys.get(t, empty) for t in terms])
        if starts.size == 0:
            return empty
        span = (ends & _POS_MASK) - (starts & _POS_MASK)
        hit = starts[span <= len(terms) - 1 + slop]
        return cand[np.unique(hit >> np.int64(32))]
    S = term_keys.get(terms[0], empty)
    for t in terms[1:]:
        if S.size == 0:
            break
        q = S + 1
        keys = term_keys.get(t, empty)
        if keys.size == 0:
            S = empty
            break
        i_safe = np.clip(np.searchsorted(keys, q), 0, keys.size - 1)
        S = q[keys[i_safe] == q]
    if S.size == 0:
        return empty
    return cand[np.unique(S >> np.int64(32))]


@ray.remote
def _verify_salt_positions(
    path: str, cand_salt: np.ndarray, terms: list[str], slop: int
) -> np.ndarray:
    """Read one salt file's phrase-term positions (row-group-pruned) and
    chain-verify them WORKER-SIDE, returning only the matched doc_ids —
    the candidate position lists never leave the worker (at 1M candidates
    x several terms the old driver-side concat was tens-to-hundreds of MB
    of data that is reduced here to at most one int64 per matched doc)."""
    got = _read_term_positions(
        path, sorted(set(terms)), int(cand_salt[0]), int(cand_salt[-1])
    )
    return _match_cand_docs(got, cand_salt, terms, slop)


def verify_phrase_positions(
    out_dir: str | Path,
    range_size: int,
    cand: np.ndarray,
    terms: list[str],
    slop: int = 0,
) -> np.ndarray:
    """Candidate docs (sorted, each containing every phrase term) that hold
    the terms as a CONTIGUOUS run (``slop=0``) or an ORDERED run whose span
    exceeds the phrase length by at most ``slop`` positions, resolved from
    the positional sidecar — O(phrase postings within candidates), no
    corpus read.

    slop=0 adjacency chain, fully vectorized: encode each (doc, position)
    as one int64 key ``rank(doc) << 32 | pos``; start from term 0's keys
    and at step j keep ``key+1`` iff present in term j's sorted keys (one
    searchsorted membership probe per step).  Surviving keys' doc ranks are
    the phrase docs.  slop>0 uses the same keys through
    :func:`chain_spans` (earliest-successor chains, exact by the
    minimal-span argument there).

    Distribution shape: docs are salt-partitioned and chains never cross
    documents, so EVERY salt verifies independently — each per-salt remote
    task reads only its pruned row groups, chains locally, and returns
    only matched doc_ids.  The driver concatenates doc_ids, never
    position lists."""
    pos_dir = Path(out_dir) / "positions"
    salts = np.unique(cand // range_size)
    by_salt = {
        int(p.name.split("-")[1]): p for p in pos_dir.glob("pos-*.parquet")
    }
    refs = []
    for s in salts:
        path = by_salt.get(int(s))
        if path is None:
            raise FileNotFoundError(
                f"positions file for salt {int(s)} missing under {pos_dir}"
            )
        lo, hi = np.searchsorted(
            cand, [int(s) * range_size, (int(s) + 1) * range_size]
        )
        refs.append(
            _verify_salt_positions.remote(
                str(path), cand[lo:hi], list(terms), slop
            )
        )
    matched = [m for m in ray.get(refs) if m.size]
    if not matched:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(matched))

"""Deterministic synthetic transcript corpus (BASELINE.json input_hint).

Schema: ``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])`` — one row per turn. Everything is a pure
function of ``n_turns`` and ``seed`` (numpy PCG64), so the same table is
regenerated bit-identically by tests, the driver's oracle SQL (which reads the
written parquet), and the bench at any scale. No external data.

Violations are injected at deterministic global-row-index positions
(FIXTURES.md §1): out-of-enum / null roles, empty / whitespace / null text,
tool-name regex breaks, tool-presence referential breaks, malformed conv_ids,
duplicated ``(conv_id, turn_idx)`` pairs, turn-index gaps, out-of-order
timestamps, non-user first turns, and one heavy-hitter conversation (~2% of
all turns) as the skew fixture.

Files are written sharded (multiple parquet files) and atomically
(tmp dir + rename), so concurrent callers race benignly.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .cache import ensure_cached_table

SEED = 42
TURNS_PER_SF = 6_000_000  # sf1.0 would be 6M turns; sf0.1 -> 600k
DEFAULT_ROOT = "/tmp/graft_transcripts_v4"  # bump suffix when generation changes

_PHRASES = np.array(
    [
        "hello how can i help you today",
        "please summarize the document",
        "here is the result of the query",
        "i will look that up now",
        "the answer is forty two",
        "let me run that tool for you",
        "can you clarify the question",
        "the file was processed successfully",
        "searching the knowledge base",
        "that request is outside my scope",
        "done running the computation",
        "the table has been updated",
    ]
)

_TOOLS = np.array(["search_web", "calculator", "python_exec", "file_read"])


def generate_transcripts(n_turns: int, seed: int = SEED) -> pa.Table:
    """Build the full corpus as one Arrow table (vectorized numpy; no Python
    row loops)."""
    rng = np.random.default_rng(seed)

    # --- conversation layout: one heavy conversation (skew fixture) + many
    # small ones averaging ~12 turns
    heavy = max(50, n_turns // 50)
    sizes = rng.integers(2, 22, size=max(4, 2 * n_turns // 12))
    sizes[0] = heavy
    ends = np.cumsum(sizes)
    n_conv = int(np.searchsorted(ends, n_turns)) + 1
    sizes = sizes[:n_conv].copy()
    sizes[-1] -= int(ends[n_conv - 1] - n_turns)
    if sizes[-1] <= 0:
        sizes = sizes[:-1]
        n_conv -= 1
    n = int(sizes.sum())

    conv_num = np.repeat(np.arange(n_conv, dtype=np.int64), sizes)
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    gidx = np.arange(n, dtype=np.int64)
    turn_idx = (gidx - starts[conv_num]).astype(np.int64)

    # --- roles: user/assistant alternation with periodic tool/system turns
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    role[(turn_idx % 7 == 3)] = "tool"
    role[(turn_idx % 13 == 6) & (turn_idx > 0)] = "system"
    # non-user first turn (first_role violations)
    first_rows = turn_idx == 0
    bad_first = first_rows & (conv_num % 83 == 5)
    role[bad_first] = "assistant"

    # --- tool column: named tool iff role == 'tool'
    tool = np.full(n, None, dtype=object)
    is_tool = role == "tool"
    tool[is_tool] = _TOOLS[(gidx[is_tool] % len(_TOOLS))]

    # --- text (string concat via Arrow kernels — np.char is ~50x slower)
    phrase_arr = pa.DictionaryArray.from_arrays(
        pa.array(rng.integers(0, len(_PHRASES), n), type=pa.int32()),
        pa.array(list(_PHRASES)),
    ).cast(pa.string())
    gidx_str = pc.cast(pa.array(gidx), pa.string())
    text = pc.binary_join_element_wise(phrase_arr, gidx_str, " #").to_numpy(
        zero_copy_only=False
    )

    # --- timestamps: monotone per conversation (7s step dominates 0-6s jitter)
    base_us = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC
    jitter = rng.integers(0, 7, n).astype(np.int64)
    ts_us = base_us + (conv_num * 3600 + turn_idx * 7 + jitter) * 1_000_000

    # --- deterministic violation injection (positions by global row index)
    role[gidx % 997 == 3] = "robot"  # enum violation
    role[gidx % 1031 == 7] = None  # null role
    text[gidx % 389 == 11] = ""  # empty text
    text[gidx % 751 == 13] = "   "  # whitespace text
    text[gidx % 941 == 47] = "\t \n"  # non-space whitespace (JS trim parity)
    text[gidx % 673 == 17] = None  # null text
    m = gidx % 557 == 19  # ref: tool missing
    role[m] = "tool"
    tool[m] = None
    m = gidx % 613 == 23  # ref: tool unexpected
    role[m] = "user"
    tool[m] = "sneaky_tool"
    m = gidx % 641 == 29  # tool regex violation
    role[m] = "tool"
    tool[m] = "9Bad-Tool"
    m = gidx % 811 == 43  # out-of-order ts (before conversation start)
    ts_us[m] -= 10_000 * 1_000_000
    m = gidx % 1303 == 59  # FORWARD ts outlier: a turn far in the future makes
    ts_us[m] += 9_000 * 1_000_000  # every later turn of the conversation late
    ts_null = gidx % 863 == 53  # null ts (type violation + order null-skip)
    m = (gidx % 907 == 41) & (turn_idx > 0)  # turn-index gap
    turn_idx[m] += 1_000_000

    padded = pc.utf8_lpad(pc.cast(pa.array(conv_num), pa.string()), 8, "0")
    prefix = np.full(n, "conv_", dtype=object)
    prefix[gidx % 1201 == 31] = "convX"  # malformed conv_id (regex violation)
    conv_id = pc.binary_join_element_wise(
        pa.array(prefix, pa.string()), padded, ""
    ).to_numpy(zero_copy_only=False)

    # --- duplicated (conv_id, turn_idx) rows (uniqueness violations)
    dup = np.nonzero(gidx % 1117 == 37)[0]
    if dup.size:
        conv_id = np.concatenate([conv_id, conv_id[dup]])
        turn_idx = np.concatenate([turn_idx, turn_idx[dup]])
        role = np.concatenate([role, role[dup]])
        dup_text = np.array(
            [None if t is None else t + " dup" for t in text[dup]], dtype=object
        )
        text = np.concatenate([text, dup_text])
        tool = np.concatenate([tool, tool[dup]])
        ts_us = np.concatenate([ts_us, ts_us[dup] + 1_000_000])
        ts_null = np.concatenate([ts_null, ts_null[dup]])

    # --- global deterministic shuffle so on-disk order ≠ conversation order
    perm = np.random.default_rng(seed + 1).permutation(len(conv_id))
    return pa.table(
        {
            "conv_id": pa.array(conv_id[perm], pa.string()),
            "turn_idx": pa.array(turn_idx[perm], pa.int32()),
            "role": pa.array(role[perm], pa.string()),
            "text": pa.array(text[perm], pa.string()),
            "tool": pa.array(tool[perm], pa.string()),
            "ts": pa.array(
                np.where(ts_null[perm], None, ts_us[perm]), pa.timestamp("us")
            ),
        }
    )


def n_turns_for_sf(sf: float) -> int:
    return max(1000, int(round(TURNS_PER_SF * sf)))


def sf_from_dir(sf_dir: str) -> float:
    """'/root/testdata/sf0.01' -> 0.01."""
    name = os.path.basename(os.path.normpath(sf_dir))
    if name.startswith("sf"):
        return float(name[2:])
    raise ValueError(f"cannot parse scale factor from {sf_dir!r}")


def transcripts_dir(sf: float, root: str = DEFAULT_ROOT) -> str:
    return os.path.join(root, f"sf{sf:g}")


def ensure_transcripts(sf: float, root: str = DEFAULT_ROOT, n_files: int | None = None) -> str:
    """Generate-and-cache the corpus for a scale factor; returns the directory
    of parquet shards. Atomic (tmp dir + rename); safe under concurrent calls."""
    return ensure_cached_table(
        lambda: generate_transcripts(n_turns_for_sf(sf)),
        transcripts_dir(sf, root),
        "transcripts",
        n_files=n_files,
        # ~50k rows per shard so a single-sf read already has enough blocks to
        # fill a 32-way pool (shards also define the resume partitions)
        shard_rows=50_000,
        max_files=64,
        row_group_size=131_072,
        marker_key="n_turns",
    )


def transcripts_glob(sf: float, root: str = DEFAULT_ROOT) -> str:
    """Glob for DuckDB's read_parquet over the cached shards."""
    return os.path.join(transcripts_dir(sf, root), "transcripts_*.parquet")

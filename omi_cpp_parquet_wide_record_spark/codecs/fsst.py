"""FSST-style string symbol-table codec (SURVEY.md §2.3), pure numpy.

Random-access string compression in the spirit of FSST (Boncz, Neumann,
Leis — "FSST: Fast Random Access String Compression", VLDB 2020): a
per-chunk table of up to 255 byte-string symbols (codes 0..254), output code
255 reserved as an escape prefix for literals outside the table. The
reference stores its string columns completely uncompressed (default writer
properties, ref NQ:3396), so this codec is one of the engine's headline wins
on web text (`url`, `text`).

Departure from the paper, for the zero-per-row-Python rule: the symbol table
is trained by iterative *vectorized pair merging* over the whole chunk corpus
(BPE-style) instead of the paper's sequential greedy bottom-up pass. Every
training round, encode pass, and the decode are whole-array numpy ops:

- pair counting        -> ``np.bincount`` over a dense (V x V) key space
- non-overlap greedy   -> run-parity selection (take alternate marks per run)
- merge apply          -> masked scatter + boolean compaction
- escape parsing       -> run-parity over 0xFF runs
- output assembly      -> cumsum offsets + per-code broadcast writes

Symbols never span row boundaries (pair validity is masked on row starts), so
decoding the concatenated corpus and re-slicing at the stored original
lengths is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from omi_cpp_parquet_wide_record_spark.codecs.base import (
    Codec, block_to_array, bytes_block, name_type, pack_uints, register,
    unpack_uints,
)

ESCAPE = 255
MAX_CODES = 255           # codes 0..254
MAX_SYMBOL_LEN = 8        # FSST paper cap
_KSPACE = 512             # token ids < 512 always (256 literals + <=254 learned)


_DEAD = _KSPACE * _KSPACE  # sentinel pair key for row-boundary positions


def _train_and_tokenize(corpus: np.ndarray, is_start: np.ndarray,
                        rounds: int, per_round: int, min_count: int):
    """Merge frequent adjacent pairs into new symbols. Returns (final token
    stream, (left,right) child pair per learned id 256+, and the per-round
    merge program [(keys, new_ids), ...] for replay on other blocks). Every
    pass is whole-array; the stream shrinks as merges land."""
    t = corpus.astype(np.int16)
    start = is_start
    pairs: list[tuple[int, int]] = []      # learned ids 256, 257, ...
    program: list[tuple[np.ndarray, np.ndarray]] = []
    exp_len = np.ones(_KSPACE, dtype=np.int32)
    next_id = 256
    idx_full = np.arange(len(t), dtype=np.int32)  # reused across rounds
    for _ in range(rounds):
        if next_id - 256 >= MAX_CODES - 1 or len(t) < 2:
            break
        # pair key = (left << 9) | right, in-place to avoid temporaries
        k = t[:-1].astype(np.int32)
        k <<= 9
        k |= t[1:]
        k[start[1:]] = _DEAD               # pairs may not span row boundaries
        counts = np.bincount(k, minlength=_DEAD + 1)
        counts[_DEAD] = 0
        cand = np.flatnonzero(counts >= min_count)
        if len(cand) == 0:
            break
        left, right = cand >> 9, cand & (_KSPACE - 1)
        fits = (exp_len[left] + exp_len[right]) <= MAX_SYMBOL_LEN
        cand, left, right = cand[fits], left[fits], right[fits]
        if len(cand) == 0:
            break
        budget = min(per_round, MAX_CODES - 1 - (next_id - 256))
        order = np.argsort(counts[cand])[::-1][:budget]
        cand, left, right = cand[order], left[order], right[order]
        lut = np.full(_DEAD + 1, -1, dtype=np.int16)
        round_ids = np.arange(next_id, next_id + len(cand), dtype=np.int16)
        lut[cand] = round_ids
        program.append((cand.astype(np.int32), round_ids))
        for l_id, r_id in zip(left.tolist(), right.tolist()):
            pairs.append((l_id, r_id))
            exp_len[next_id] = exp_len[l_id] + exp_len[r_id]
            next_id += 1
        # positions whose pair is chosen; greedy-left-to-right non-overlap
        new_ids = lut[k]
        marked = new_ids >= 0
        if not marked.any():
            break
        run_start = marked.copy()
        run_start[1:] &= ~marked[:-1]
        pos = idx_full[:len(marked)]
        anchor = np.where(run_start, pos, 0)
        np.maximum.accumulate(anchor, out=anchor)
        take = marked
        take &= ((pos - anchor) & 1) == 0
        sel = np.flatnonzero(take)
        t[sel] = new_ids[sel]
        keep = np.ones(len(t), dtype=bool)
        keep[sel + 1] = False
        t = t[keep]
        start = start[keep]
        if len(sel) < len(t) // 100:       # diminishing returns: stop early
            break
    return t, pairs, program


def _apply_program(corpus: np.ndarray, is_start: np.ndarray,
                   program, lut: np.ndarray) -> np.ndarray:
    """Replay a trained merge program on one (cache-sized) corpus block:
    per round only lut-gather + parity-select + compaction — no counting."""
    t = corpus.astype(np.int16)
    start = is_start
    idx_full = np.arange(len(t), dtype=np.int32)
    for keys, ids in program:
        if len(t) < 2:
            break
        lut[keys] = ids
        k = t[:-1].astype(np.int32)
        k <<= 9
        k |= t[1:]
        k[start[1:]] = _DEAD
        new_ids = lut[k]
        marked = new_ids >= 0
        if marked.any():
            run_start = marked.copy()
            run_start[1:] &= ~marked[:-1]
            pos = idx_full[:len(marked)]
            anchor = np.where(run_start, pos, 0)
            np.maximum.accumulate(anchor, out=anchor)
            take = marked
            take &= ((pos - anchor) & 1) == 0
            sel = np.flatnonzero(take)
            t[sel] = new_ids[sel]
            keep = np.ones(len(t), dtype=bool)
            keep[sel + 1] = False
            t = t[keep]
            start = start[keep]
        lut[keys] = -1     # restore shared lut for the next round/block
    return t


def _assign_codes(t: np.ndarray, pairs: list[tuple[int, int]]
                  ) -> tuple[np.ndarray, list[bytes], np.ndarray]:
    """Give the 255 output codes to the most frequent *final* tokens
    (learned or literal alike) and demote the rest.

    A learned symbol without a code cannot be escaped (escape carries one
    literal byte), so demoted symbols are re-expanded in the stream into
    their nearest coded/literal descendants — one vectorized splice. This is
    what keeps high-entropy payloads near 1x instead of 2x: frequent raw
    bytes win codes over marginal learned symbols.

    Returns (token stream with demoted ids spliced out, code table as
    expansion bytes per code, code_of lut over token ids)."""
    n_ids = 256 + len(pairs)
    alive = set(range(256, n_ids))  # learned ids still eligible for codes
    while True:
        freq = np.bincount(t, minlength=n_ids)
        order = np.argsort(freq, kind="stable")[::-1]
        coded = [int(i) for i in order[:MAX_CODES] if freq[i] > 0]
        coded_set = set(coded)
        demoted = [i for i in alive if i not in coded_set and freq[i] > 0]
        if not demoted:
            break
        alive -= set(demoted)
        dem_set = set(demoted)

        def expand(tok: int) -> list[int]:
            if tok < 256 or tok in alive:
                return [tok]
            l_id, r_id = pairs[tok - 256]
            return expand(l_id) + expand(r_id)

        exp_tokens = {d: expand(d) for d in demoted}
        # one LUT gather for widths; per-symbol work only on the (small)
        # demoted-occurrence subset — never per-symbol full-stream masks
        wlut = np.ones(n_ids, dtype=np.int64)
        for d, seq in exp_tokens.items():
            wlut[d] = len(seq)
        widths = wlut[t]
        ends = np.cumsum(widths)
        t2 = np.empty(int(ends[-1]) if len(ends) else 0, dtype=np.int16)
        pos = ends - widths
        keep_mask = widths == 1
        t2[pos[keep_mask]] = t[keep_mask]
        dp = np.flatnonzero(~keep_mask)
        dp_tok, dp_pos = t[dp], pos[dp]
        for d, seq in exp_tokens.items():
            p = dp_pos[dp_tok == d]
            if len(p):
                t2[p[:, None] + np.arange(len(seq))] = np.array(seq, np.int16)
        t = t2
        # splice shifts freqs; loop until the top-255 is demotion-free

    # expansion bytes per id (for the table)
    exp_bytes: dict[int, bytes] = {}

    def expansion(tok: int) -> bytes:
        if tok < 256:
            return bytes([tok])
        if tok not in exp_bytes:
            l_id, r_id = pairs[tok - 256]
            exp_bytes[tok] = expansion(l_id) + expansion(r_id)
        return exp_bytes[tok]

    code_of = np.full(n_ids, -1, dtype=np.int16)
    table: list[bytes] = []
    for tok in coded:
        code_of[tok] = len(table)
        table.append(expansion(tok))
    return t, table, code_of


class FsstCodec(Codec):
    name = "fsst"

    def __init__(self, rounds: int = 6, per_round: int = 64, min_count: int = 8):
        self.rounds = rounds
        self.per_round = per_round
        self.min_count = min_count

    def encode(self, arr: pa.Array) -> tuple[list[bytes], dict]:
        lengths, corpus_mv = bytes_block(arr)
        lens_payload, lens_params = pack_uints(lengths)
        corpus = np.frombuffer(corpus_mv, dtype=np.uint8)
        n_rows = len(arr)
        if len(corpus) == 0:
            return [b"", b"", lens_payload, b""], {
                "n": n_rows, "ncodes": 0, "lens": lens_params}
        is_start = np.zeros(len(corpus), dtype=bool)
        starts = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])
        is_start[starts[:-1][lengths > 0]] = True

        TRAIN_BYTES = 2 << 20
        BLOCK_BYTES = 4 << 20
        if len(corpus) <= BLOCK_BYTES:
            min_count = max(self.min_count, len(corpus) >> 15)
            t, pairs, _prog = _train_and_tokenize(
                corpus, is_start, self.rounds, self.per_round, min_count)
        else:
            # train on a strided row sample (2 MB), replay the merge program
            # on ~4 MB blocks — cache-resident passes, counting only once
            row_off = starts[:-1]
            nz = np.flatnonzero(lengths > 0)
            stride = max(1, int(np.ceil(
                float(lengths[nz].sum()) / TRAIN_BYTES)))
            pick = nz[::stride]
            plens = lengths[pick]
            psrc = np.repeat(row_off[pick], plens) + (
                np.arange(int(plens.sum())) -
                np.repeat(np.concatenate(([0], np.cumsum(plens)[:-1])), plens))
            sample = corpus[psrc]
            s_start = np.zeros(len(sample), dtype=bool)
            s_off = np.concatenate(([0], np.cumsum(plens)[:-1]))
            s_start[s_off] = True
            min_count = max(self.min_count, len(sample) >> 15)
            _st, pairs, prog = _train_and_tokenize(
                sample, s_start, self.rounds, self.per_round, min_count)
            # block boundaries at row starts near multiples of BLOCK_BYTES
            row_ends = np.cumsum(lengths)
            cuts = [0]
            target = BLOCK_BYTES
            for i, e in enumerate(row_ends.tolist()):
                if e >= target:
                    cuts.append(i + 1)
                    target = e + BLOCK_BYTES
            if cuts[-1] != n_rows:
                cuts.append(n_rows)
            lut = np.full(_DEAD + 1, -1, dtype=np.int16)
            parts = []
            for a, b in zip(cuts[:-1], cuts[1:]):
                lo = int(row_off[a])
                hi = int(row_ends[b - 1]) if b > a else lo
                if hi <= lo:
                    continue
                blk = corpus[lo:hi]
                bs = is_start[lo:hi]
                parts.append(_apply_program(blk, bs, prog, lut))
            t = np.concatenate(parts) if parts else corpus.astype(np.int16)
        t, table, code_of = _assign_codes(t, pairs)

        codes = code_of[t]
        w = np.where(codes >= 0, 1, 2).astype(np.int64)
        ends = np.cumsum(w)
        out = np.empty(int(ends[-1]), dtype=np.uint8)
        pos = ends - w
        m1 = codes >= 0
        out[pos[m1]] = codes[m1].astype(np.uint8)
        m2 = ~m1
        out[pos[m2]] = ESCAPE
        out[pos[m2] + 1] = t[m2].astype(np.uint8)  # escaped ids are literals <256

        tab_lens = np.array([len(s) for s in table], dtype=np.uint8)
        return [tab_lens.tobytes(), b"".join(table), lens_payload,
                out.tobytes()], {"n": n_rows, "ncodes": len(table),
                                 "lens": lens_params}

    def decode(self, sections, params: dict) -> pa.Array:
        target = name_type(params["atype"])
        lengths = unpack_uints(sections[2], params["lens"])
        enc = np.frombuffer(sections[3], dtype=np.uint8)
        if len(enc) == 0:
            return block_to_array(lengths, b"", target)
        ncodes = params["ncodes"]
        tab_lens = np.frombuffer(sections[0], dtype=np.uint8, count=ncodes)
        tab_data = bytes(sections[1])
        offs = np.zeros(ncodes + 1, dtype=np.int64)
        np.cumsum(tab_lens, out=offs[1:])
        exps = [tab_data[offs[i]:offs[i + 1]] for i in range(ncodes)]
        exp_arrs = [np.frombuffer(e, dtype=np.uint8) for e in exps]
        code_len = np.ones(256, dtype=np.int64)
        code_len[:ncodes] = tab_lens

        # escape parsing: inside each run of consecutive 0xFF bytes, the
        # even-offset ones are escape markers, odd-offset ones are literals
        is_ff = enc == ESCAPE
        run_start = is_ff & ~np.concatenate(([False], is_ff[:-1]))
        anchor = np.where(run_start, np.arange(len(enc)), 0)
        np.maximum.accumulate(anchor, out=anchor)
        marker = is_ff & (((np.arange(len(enc)) - anchor) & 1) == 0)
        literal_slot = np.zeros(len(enc) + 1, dtype=bool)
        literal_slot[np.flatnonzero(marker) + 1] = True
        literal_slot = literal_slot[:-1]
        is_code = ~is_ff & ~literal_slot

        tok_pos = np.flatnonzero(marker | is_code)
        tok_esc = marker[tok_pos]
        widths = np.where(tok_esc, 1, code_len[enc[tok_pos]])
        ends = np.cumsum(widths)
        out = np.empty(int(ends[-1]) if len(ends) else 0, dtype=np.uint8)
        pos = ends - widths
        # escaped literals: single-byte copy
        ep = tok_pos[tok_esc]
        out[pos[tok_esc]] = enc[ep + 1]
        # code tokens: single-byte expansions (the common case on
        # escape-heavy data) decode with one LUT gather; multi-byte codes
        # are grouped by one sort and written per group
        cp_mask = ~tok_esc
        cp_codes = enc[tok_pos[cp_mask]]
        cp_pos = pos[cp_mask]
        lens_of = code_len[cp_codes]
        one = lens_of == 1
        if one.any():
            lut1 = np.zeros(256, dtype=np.uint8)
            for c in range(ncodes):
                if tab_lens[c] == 1:
                    lut1[c] = exp_arrs[c][0]
            out[cp_pos[one]] = lut1[cp_codes[one]]
        multi = ~one
        if multi.any():
            mc, mp_ = cp_codes[multi], cp_pos[multi]
            order = np.argsort(mc, kind="stable")
            sc, sp = mc[order], mp_[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(sc[1:] != sc[:-1]) + 1, [len(sc)]))
            for gi in range(len(bounds) - 1):
                lo, hi = int(bounds[gi]), int(bounds[gi + 1])
                if lo == hi:
                    continue
                e = exp_arrs[int(sc[lo])]
                out[sp[lo:hi, None] + np.arange(len(e))] = e
        assert int(lengths.sum()) == len(out), "fsst decode length mismatch"
        return block_to_array(lengths, out.tobytes(), target)


register(FsstCodec())

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


def _train_and_tokenize(corpus: np.ndarray, is_start: np.ndarray,
                        rounds: int, per_round: int, min_count: int
                        ) -> tuple[np.ndarray, list[bytes]]:
    """Merge frequent adjacent pairs into new symbols; returns final token
    stream (ids < 256+L) and the expansion bytes for learned ids 256+."""
    t = corpus.astype(np.int16)
    start = is_start.copy()
    expansions: list[bytes] = []          # learned ids 256, 257, ...
    exp_len = np.ones(_KSPACE, dtype=np.int32)  # byte length per token id
    next_id = 256
    for _ in range(rounds):
        if next_id - 256 >= MAX_CODES - 1 or len(t) < 2:
            break
        k = t[:-1].astype(np.int32) * _KSPACE + t[1:].astype(np.int32)
        valid = ~start[1:]
        counts = np.bincount(k[valid], minlength=_KSPACE * _KSPACE)
        # candidate pairs: frequent and expansion fits the FSST length cap
        cand = np.flatnonzero(counts >= min_count)
        if len(cand) == 0:
            break
        left, right = cand // _KSPACE, cand % _KSPACE
        fits = (exp_len[left] + exp_len[right]) <= MAX_SYMBOL_LEN
        cand, left, right = cand[fits], left[fits], right[fits]
        if len(cand) == 0:
            break
        budget = min(per_round, MAX_CODES - 1 - (next_id - 256))
        order = np.argsort(counts[cand])[::-1][:budget]
        cand, left, right = cand[order], left[order], right[order]
        lut = np.full(_KSPACE * _KSPACE, -1, dtype=np.int16)
        for key, l_id, r_id in zip(cand.tolist(), left.tolist(), right.tolist()):
            lut[key] = next_id
            l_exp = expansions[l_id - 256] if l_id >= 256 else bytes([l_id])
            r_exp = expansions[r_id - 256] if r_id >= 256 else bytes([r_id])
            expansions.append(l_exp + r_exp)
            exp_len[next_id] = exp_len[l_id] + exp_len[r_id]
            next_id += 1
        # mark positions whose pair is chosen, greedy-left-to-right non-overlap
        new_ids = lut[k]
        marked = (new_ids >= 0) & valid
        if not marked.any():
            break
        run_start = marked & ~np.concatenate(([False], marked[:-1]))
        anchor = np.where(run_start, np.arange(len(marked)), 0)
        np.maximum.accumulate(anchor, out=anchor)
        take = marked & (((np.arange(len(marked)) - anchor) & 1) == 0)
        sel = np.flatnonzero(take)
        t[sel] = new_ids[sel]
        keep = np.ones(len(t), dtype=bool)
        keep[sel + 1] = False
        t = t[keep]
        start = start[keep]
    return t, expansions


class FsstCodec(Codec):
    name = "fsst"

    def __init__(self, rounds: int = 8, per_round: int = 48, min_count: int = 8):
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

        t, expansions = _train_and_tokenize(
            corpus, is_start, self.rounds, self.per_round, self.min_count)
        n_learned = len(expansions)

        # assign output codes: learned symbols first, then frequent literals
        freq = np.bincount(t, minlength=256 + n_learned)
        code_of = np.full(256 + max(n_learned, 1), -1, dtype=np.int16)
        table: list[bytes] = []
        for i in range(n_learned):
            code_of[256 + i] = len(table)
            table.append(expansions[i])
        lit_slots = MAX_CODES - n_learned
        lit_order = np.argsort(freq[:256])[::-1]
        for lit in lit_order[:lit_slots].tolist():
            if freq[lit] == 0:
                break
            code_of[lit] = len(table)
            table.append(bytes([lit]))

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
        # code tokens: one broadcast write per distinct code (<=255 loops)
        cp_mask = ~tok_esc
        cp_codes = enc[tok_pos[cp_mask]]
        cp_pos = pos[cp_mask]
        for c in np.unique(cp_codes).tolist():
            e = exp_arrs[c]
            p = cp_pos[cp_codes == c]
            out[p[:, None] + np.arange(len(e))] = e
        assert int(lengths.sum()) == len(out), "fsst decode length mismatch"
        return block_to_array(lengths, out.tobytes(), target)


register(FsstCodec())

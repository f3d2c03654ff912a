"""Deterministic hash-based subword tokenizer.

The reference wraps a HuggingFace fast tokenizer
(span_marker/tokenizer.py:192-200) to get input_ids plus
word<->token<->char alignment. Neither HF nor any trained vocab is
available in this container, so we implement the same *contract* with
a deterministic pure function: words are split into fixed-width
character pieces, each piece is hashed into a bounded vocab id, and
the word->token / word->char alignment arrays are computed exactly.
Same input => byte-identical output on every executor.

These are plain-Python/numpy-free functions used from inside Arrow
batch UDFs (mapInPandas) and from the single-process oracle.
"""

from __future__ import annotations

import hashlib

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
START_MARKER_ID = 3
END_MARKER_ID = 4
NUM_SPECIAL = 5

PIECE_WIDTH = 4  # chars per subword piece


def piece_id(piece: str, vocab_size: int) -> int:
    """Stable 'vocabulary lookup': md5-hash a piece into [NUM_SPECIAL, vocab)."""
    h = hashlib.md5(piece.encode("utf-8")).digest()
    return NUM_SPECIAL + int.from_bytes(h[:8], "big") % (vocab_size - NUM_SPECIAL)


def word_pieces(word: str) -> list[str]:
    """Split a word into PIECE_WIDTH-char pieces (>=1 piece; the empty
    word degenerates to one empty piece, mirroring the reference's
    0-fallback for degenerate words, tokenizer.py:236-243)."""
    if not word:
        return [""]
    return [word[i : i + PIECE_WIDTH] for i in range(0, len(word), PIECE_WIDTH)]


# word -> piece-id list memo (r4 verdict ask #3: encode_words was ~25%
# of scorer prep). Natural-language words are Zipf-distributed, so
# after warmup almost every word is ONE dict hit instead of
# ceil(len/4) md5 digests. Pure memoization of a pure function —
# results are bit-identical, fixtures unaffected. Bounded: cleared
# when it would exceed _WORD_IDS_MAX entries (long-lived executor
# workers see unbounded url/number tokens).
_WORD_IDS: dict[tuple[str, int], list[int]] = {}
_WORD_IDS_MAX = 1 << 20


def _word_ids(word: str, vocab_size: int) -> list[int]:
    key = (word, vocab_size)
    ids = _WORD_IDS.get(key)
    if ids is None:
        if len(_WORD_IDS) >= _WORD_IDS_MAX:
            _WORD_IDS.clear()
        ids = [piece_id(p, vocab_size) for p in word_pieces(word)]
        _WORD_IDS[key] = ids
    return ids


def encode_words(
    words: list[str], vocab_size: int, model_max_length: int
) -> dict:
    """Tokenize one pre-split sentence.

    Returns dict with:
      input_ids        [CLS] pieces... [SEP], truncated to model_max_length
      num_words        words that fully fit after truncation
      word_tok_start   word i -> first token index in input_ids
      word_tok_end     word i -> last token index in input_ids
      word_char_start  word i -> char offset in ' '.join(words)
      word_char_end    word i -> exclusive char end
    """
    input_ids: list[int] = [CLS_ID]
    word_tok_start: list[int] = []
    word_tok_end: list[int] = []
    word_char_start: list[int] = []
    word_char_end: list[int] = []
    budget = model_max_length - 1  # leave room for [SEP]
    char_pos = 0
    num_words = 0
    for w in words:
        ids = _word_ids(w, vocab_size)
        if len(input_ids) + len(ids) > budget:
            break  # truncate whole words, like HF truncation at word level
        word_tok_start.append(len(input_ids))
        input_ids.extend(ids)
        word_tok_end.append(len(input_ids) - 1)
        word_char_start.append(char_pos)
        word_char_end.append(char_pos + len(w))
        char_pos += len(w) + 1  # single-space joined
        num_words += 1
    input_ids.append(SEP_ID)
    return {
        "input_ids": input_ids,
        "num_words": num_words,
        "word_tok_start": word_tok_start,
        "word_tok_end": word_tok_end,
        "word_char_start": word_char_start,
        "word_char_end": word_char_end,
    }


def enumerate_spans(num_words: int, entity_max_length: int) -> list[tuple[int, int]]:
    """All candidate (start, end) with start < end <= min(num_words,
    start+entity_max_length) — the reference's span enumeration
    (tokenizer.py:161-164), O(n*L) per sentence."""
    out = []
    for s in range(num_words):
        for e in range(s + 1, min(num_words, s + entity_max_length) + 1):
            out.append((s, e))
    return out

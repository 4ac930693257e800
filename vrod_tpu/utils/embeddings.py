"""Text -> embedding ingest utility.

Mirrors the reference's only working data path
(``/root/reference/src/utils/embeddings.rs:6-71``): take the first N
whitespace-split words of a source text, embed each word to a 384-dim f32
vector, print count/dim/memory diagnostics, and write ``alice_embeddings.txt``
with one ``v0,v1,...;word`` line per vector (format string at
``embeddings.rs:61``).

The reference uses fastembed's default ONNX model (BGESmallENV15, 384-dim,
``embeddings.rs:7``), which needs a model download. This environment has no
egress, so the default embedder is a deterministic feature-hashed character
n-gram model (384-dim, L2-normalized) — fully offline, stable across runs,
and adequate for exercising the ingest + search pipeline. If a local
sentence-transformers model is available it can be passed via ``embed_fn``.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np

DEFAULT_DIM = 384  # fastembed BGESmallENV15 output dim (embeddings.rs:7)
DEFAULT_SOURCE = "alice_in_wonderland.txt"
DEFAULT_OUTPUT = "alice_embeddings.txt"

# A public-domain fallback excerpt (Lewis Carroll, 1865) used when no source
# text file is present, so `--generate-embeddings` works out of the box.
_FALLBACK_TEXT = """
Alice was beginning to get very tired of sitting by her sister on the bank
and of having nothing to do once or twice she had peeped into the book her
sister was reading but it had no pictures or conversations in it and what is
the use of a book thought Alice without pictures or conversations So she was
considering in her own mind as well as she could for the hot day made her
feel very sleepy and stupid whether the pleasure of making a daisy chain
would be worth the trouble of getting up and picking the daisies when
suddenly a White Rabbit with pink eyes ran close by her
"""


def hash_embed(texts: list[str], dim: int = DEFAULT_DIM) -> np.ndarray:
    """Deterministic feature-hashed char-trigram embeddings, L2-normalized."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, text in enumerate(texts):
        t = f"^{text.lower()}$"
        grams = [t[j:j + 3] for j in range(max(len(t) - 2, 1))]
        for g in grams:
            h = hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "little") % dim
            sign = 1.0 if h[4] & 1 else -1.0
            out[i, idx] += sign
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out


def extract_words(text: str, n: int) -> list[str]:
    """First n whitespace-split words (reference: extract_words, :22-27)."""
    return text.split()[:n]


def print_embeddings_info(embeddings: np.ndarray, words: list[str]) -> None:
    """Count/dim/memory diagnostics (reference: print_embeddings_info, :33-50)."""
    n, dim = embeddings.shape
    mem = embeddings.nbytes
    print(f"Number of embeddings: {n}")
    print(f"Embedding dimension: {dim}")
    print(f"Embeddings memory size: {mem} bytes ({mem / 1024:.2f} KiB)")
    if words:
        print(f"First word: {words[0]!r}")


def write_embeddings_to_file(embeddings: np.ndarray, words: list[str],
                             path: str | Path = DEFAULT_OUTPUT) -> Path:
    """One ``v0,v1,...;word`` line per vector (reference: :52-71)."""
    from ..records import format_record
    path = Path(path)
    with open(path, "w") as f:
        for vec, word in zip(embeddings, words):
            f.write(format_record(vec, word) + "\n")
    print(f"Wrote {len(words)} embeddings to {path} "
          f"({path.stat().st_size} bytes)")
    return path


def process_embeddings(n: int, source: str | Path | None = None,
                       output: str | Path = DEFAULT_OUTPUT,
                       embed_fn=None, dim: int = DEFAULT_DIM) -> Path:
    """End-to-end ingest (reference: process_embeddings, :6-20)."""
    if n < 0:
        from ..errors import VrodError
        raise VrodError(
            f"--generate-embeddings amount must be >= 0, got {n} "
            f"(a negative slice would silently trim from the tail)")
    src = Path(source) if source else Path(DEFAULT_SOURCE)
    if source is not None and not src.exists():
        # The built-in excerpt only substitutes for the DEFAULT source; an
        # explicitly requested corpus that is missing must error, not
        # silently embed the wrong text.
        from ..errors import VrodError
        raise VrodError(f"Embeddings source file not found: {src}")
    text = src.read_text() if src.exists() else _FALLBACK_TEXT
    words = extract_words(text, n)
    embed = embed_fn or (lambda ws: hash_embed(ws, dim))
    embeddings = np.asarray(embed(words), dtype=np.float32)
    print_embeddings_info(embeddings, words)
    return write_embeddings_to_file(embeddings, words, output)

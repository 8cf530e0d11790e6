"""Corpus fingerprinting for index persistence.

The reference has no index persistence at all (its checkpoints are
model-only, ``nlsh/hashings.py:53-57``); ``Indexer.save``/``load`` here
skip the corpus re-hash on restart, which makes it possible to pair a
saved table with the WRONG corpus.  The guard is a digest over a fixed
row sample: head + tail + a strided sweep through the middle, plus the
exact shape — so appends, truncations, tail edits, and any in-place
edit touching >~1/256 of the rows are all rejected (a head-only digest,
the round-3 scheme, accepted any corpus sharing the first 64 rows).
"""

from __future__ import annotations

import hashlib

import numpy as np

#: rows hashed from each end + across the middle; the sample is O(1)
#: in corpus size so save/load cost stays flat at 10M rows (the corpus
#: may live on device — one gather + one host fetch)
_EDGE = 64
_STRIDED = 256

#: digest-format tag, embedded in the digest string: lets ``load``
#: distinguish "artifact from an older fingerprint scheme — rebuild"
#: from "corpus really differs" (the round-3 head-only digests can
#: never match this scheme, so without the tag every old artifact
#: would fail with the misleading 'different corpus' error)
_VERSION = "v2"


def _sample_indices(n: int) -> np.ndarray:
    idx = np.concatenate([
        np.arange(min(_EDGE, n)),
        np.arange(max(0, n - _EDGE), n),
        np.linspace(0, n - 1, num=min(_STRIDED, n)).astype(np.int64),
    ])
    return np.unique(idx)


def corpus_fingerprint(corpus, n_real: int | None = None) -> str:
    """``"v2:<16-hex>"`` digest of ``corpus`` (array-like, host or
    device).

    ``n_real`` bounds the rows considered (sharded corpora are padded to
    a multiple of the shard count; padding must not enter the digest).
    """
    n = int(corpus.shape[0]) if n_real is None else int(n_real)
    d = int(corpus.shape[1])
    idx = _sample_indices(n)
    # one fancy-index gather + one host fetch, O(sample) bytes
    rows = np.ascontiguousarray(np.asarray(corpus[idx]), dtype=np.float32)
    h = hashlib.sha1()
    h.update(np.array([n, d], np.int64).tobytes())
    h.update(rows.tobytes())
    return f"{_VERSION}:{h.hexdigest()[:16]}"


def check_fingerprint(stored: str, corpus, n_real: int | None = None,
                      what: str = "index") -> None:
    """Raise ``ValueError`` with a precise reason when ``stored`` does
    not match ``corpus``: stale digest format (rebuild the artifact) vs
    an actual corpus mismatch."""
    if not stored.startswith(_VERSION + ":"):
        raise ValueError(
            f"saved {what} uses an older corpus-fingerprint format "
            f"({stored[:8]!r}...); rebuild and re-save the {what}"
        )
    if corpus_fingerprint(corpus, n_real=n_real) != stored:
        raise ValueError(
            f"saved {what} was built over a different corpus "
            "(fingerprint mismatch)"
        )

"""Deterministic synthetic Common-Crawl-style corpus with planted duplicates.

Scales up the reference's fixture pattern — a tempdir with ``a.jpg``="same",
``b.jpg``="same", ``c.png``="diff" and exactly one expected duplicate group
(reference src/scanner.rs:110-133) — into a seeded generator of the north-rule
``pages(url, warc_ts, html, text, lang)`` table with:

* exact-dup clusters (byte-identical text, distinct url/warc_ts)
* near-dup clusters (token-level edits at controlled Jaccard on 5-gram shingles)
* SimHash-only pairs (small character-level perturbations)
* substring-overlap pairs (one text embedded verbatim in a longer one)
* a boilerplate skew block (many distinct docs sharing a large header/footer —
  stresses LSH band-key skew; must NOT merge into one cluster)
* singletons

plus a ``ground_truth(url, gt_cluster)`` side table.  Everything derives from
a single numpy seed — no external data.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

LANGS = ["en", "en", "en", "en", "de", "es", "fr", "zh"]
BASE_TS = pd.Timestamp("2025-01-01 00:00:00")


def _vocab(rng: np.random.RandomState, size: int = 4000) -> list[str]:
    """Deterministic pseudo-word vocabulary."""
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    for _ in range(size):
        n = rng.randint(3, 10)
        words.append("".join(letters[rng.randint(0, 26, n)]))
    return words


def _doc_text(rng: np.random.RandomState, vocab: list[str], n_words: int) -> str:
    idx = rng.randint(0, len(vocab), n_words)
    return " ".join(vocab[i] for i in idx)


def _edit_tokens(
    rng: np.random.RandomState, text: str, vocab: list[str], frac: float
) -> str:
    """Replace ~frac of tokens — controls 5-gram-shingle Jaccard roughly as
    (1-frac)^5 overlap on each side."""
    toks = text.split()
    n_edit = max(1, int(len(toks) * frac))
    pos = rng.choice(len(toks), size=n_edit, replace=False)
    for p in pos:
        toks[p] = vocab[rng.randint(0, len(vocab))]
    return " ".join(toks)


def _perturb_chars(rng: np.random.RandomState, text: str, n: int) -> str:
    """Flip n single characters (SimHash-near, possibly MinHash-far for tiny docs)."""
    chars = list(text)
    for _ in range(n):
        p = rng.randint(0, len(chars))
        chars[p] = "abcdefghijklmnopqrstuvwxyz"[rng.randint(0, 26)]
    return "".join(chars)


@dataclass
class Corpus:
    pages: pd.DataFrame        # url, warc_ts, html, text, lang
    ground_truth: pd.DataFrame  # url, gt_cluster (only rows in true dup clusters)

    def true_pairs(self) -> set[tuple[str, str]]:
        """All unordered ground-truth duplicate pairs (url1 < url2)."""
        pairs: set[tuple[str, str]] = set()
        for _, grp in self.ground_truth.groupby("gt_cluster"):
            urls = sorted(grp["url"])
            for i in range(len(urls)):
                for j in range(i + 1, len(urls)):
                    pairs.add((urls[i], urls[j]))
        return pairs


def generate_corpus(
    n_docs: int = 500,
    seed: int = 42,
    doc_words: tuple[int, int] = (80, 400),
    exact_frac: float = 0.12,
    near_frac: float = 0.12,
    simhash_frac: float = 0.04,
    substr_frac: float = 0.04,
    boiler_frac: float = 0.10,
    near_edit_frac: float = 0.03,
) -> Corpus:
    """Build a corpus of ~n_docs pages.  Fractions are of n_docs and denote
    rows *participating* in each planted structure."""
    rng = np.random.RandomState(seed)
    vocab = _vocab(rng)
    rows: list[dict] = []
    gt: list[dict] = []
    cluster_id = 0
    doc_id = 0

    def add_row(text: str, lang: str, gt_cluster: int | None) -> None:
        nonlocal doc_id
        url = f"https://src{doc_id % 20}.example/{lang}/doc{doc_id}"
        ts = BASE_TS + pd.Timedelta(seconds=int(rng.randint(0, 30 * 86400)))
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": b"<html><body>" + text.encode() + b"</body></html>",
                "text": text,
                "lang": lang,
            }
        )
        if gt_cluster is not None:
            gt.append({"url": url, "gt_cluster": gt_cluster})
        doc_id += 1

    def new_text() -> str:
        return _doc_text(rng, vocab, rng.randint(*doc_words))

    def lang() -> str:
        return LANGS[rng.randint(0, len(LANGS))]

    n_exact = int(n_docs * exact_frac)
    n_near = int(n_docs * near_frac)
    n_sim = int(n_docs * simhash_frac)
    n_sub = int(n_docs * substr_frac)
    n_boiler = int(n_docs * boiler_frac)

    # exact-dup clusters of size 2-5 (camden's "same"/"same" case)
    placed = 0
    while placed < n_exact:
        size = int(rng.randint(2, 6))
        size = min(size, n_exact - placed) if n_exact - placed >= 2 else 2
        text, lg = new_text(), lang()
        for _ in range(size):
            add_row(text, lg, cluster_id)
        cluster_id += 1
        placed += size

    # near-dup clusters (token edits → high shingle Jaccard)
    placed = 0
    while placed < n_near:
        size = int(rng.randint(2, 4))
        size = min(size, n_near - placed) if n_near - placed >= 2 else 2
        base, lg = new_text(), lang()
        add_row(base, lg, cluster_id)
        for _ in range(size - 1):
            add_row(_edit_tokens(rng, base, vocab, near_edit_frac), lg, cluster_id)
        cluster_id += 1
        placed += size

    # SimHash-only pairs (character flips)
    for _ in range(max(1, n_sim // 2)):
        base, lg = new_text(), lang()
        add_row(base, lg, cluster_id)
        add_row(_perturb_chars(rng, base, 3), lg, cluster_id)
        cluster_id += 1

    # substring-containment pairs (short doc embedded in a long doc)
    for _ in range(max(1, n_sub // 2)):
        inner, lg = _doc_text(rng, vocab, rng.randint(60, 120)), lang()
        prefix = _doc_text(rng, vocab, rng.randint(150, 300))
        suffix = _doc_text(rng, vocab, rng.randint(150, 300))
        add_row(inner, lg, cluster_id)
        add_row(f"{prefix} {inner} {suffix}", lg, cluster_id)
        cluster_id += 1

    # boilerplate skew block: distinct bodies sharing a big header/footer.
    # NOT duplicates (no gt rows) — recall/precision tests check they stay apart.
    header = _doc_text(rng, vocab, 40)
    footer = _doc_text(rng, vocab, 30)
    for _ in range(n_boiler):
        body = _doc_text(rng, vocab, rng.randint(120, 300))
        add_row(f"{header} {body} {footer}", lang(), None)

    # singletons (camden's "diff" case)
    while doc_id < n_docs:
        add_row(new_text(), lang(), None)

    pages = pd.DataFrame(rows)
    ground_truth = pd.DataFrame(gt, columns=["url", "gt_cluster"])
    return Corpus(pages=pages, ground_truth=ground_truth)


def write_corpus(corpus: Corpus, out_dir: str) -> None:
    """Write pages + ground_truth as parquet (the sandbox's Iceberg stand-in)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages = corpus.pages.copy()
    # Spark's parquet reader rejects TIMESTAMP(NANOS) — write microseconds.
    # Small row groups keep the file SPLITTABLE: one giant row group would
    # make the initial scan a single Spark task regardless of cluster size.
    pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
    pages.to_parquet(f"{out_dir}/pages.parquet", index=False, row_group_size=2048)
    corpus.ground_truth.to_parquet(f"{out_dir}/ground_truth.parquet", index=False)


# --------------------------------------------------------------------------
# Media corpus: synthetic netpbm images + PCM WAV audio with planted
# perceptual near-duplicates (exercises the REAL stdlib decode path in
# multimodal.py — the reference deduped image FILES by checksum; the north
# rule's generalization dedups by content similarity after decode).
# --------------------------------------------------------------------------

def _synth_image(rng: np.random.RandomState, size: int = 32) -> np.ndarray:
    """Deterministic RGB test pattern: 2-D sinusoid mix + gradient, kept in
    the [40, 215] mid-range so brightness-shifted near-dups never clip (a
    clipped shift is a structural edit, not a photometric one)."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size
    img = np.zeros((size, size, 3))
    for c in range(3):
        fx, fy = rng.uniform(1, 5, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img[:, :, c] = (
            0.5
            + 0.25 * np.sin(2 * np.pi * (fx * x + fy * y) + ph)
            + 0.25 * (x if c == 0 else y if c == 1 else (x + y) / 2)
        )
    lo, hi = img.min(), img.max()
    return (40 + (img - lo) / max(hi - lo, 1e-9) * 175).astype(np.uint8)


def _synth_wav(rng: np.random.RandomState, base: float, rate: int = 8000,
               sec: float = 0.5, amp: float = 0.5) -> bytes:
    """Deterministic PCM16 WAV: mix of 3 harmonics at the given base pitch."""
    import io
    import wave

    t = np.arange(int(rate * sec)) / rate
    s = sum(
        rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * base * k * t)
        for k in (1, 2, 3)
    )
    pcm = (np.clip(amp * s / 3, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def generate_media(
    n_items: int = 60, seed: int = 42, dup_frac: float = 0.3
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(media table, true near-dup pairs) with planted perceptual dups:
    brightness-shifted / lightly-noised image copies, amplitude-scaled audio
    copies — plus undecodable payloads (error-row semantics).

    Columns match multimodal.MEDIA_SCHEMA.
    """
    from camden_spark.multimodal import encode_pnm

    rng = np.random.RandomState(seed)
    rows: list[dict] = []
    true_pairs: list[tuple[int, int]] = []
    mid = 0
    used_pitches: list[float] = []

    def fresh_pitch() -> float:
        """Pitch ≥ 70 Hz away from every used one — keeps DISTINCT audio
        items' spectral hashes well separated (band width ≈ 62 Hz)."""
        for _ in range(200):
            p = float(rng.uniform(100, 3000))
            if all(abs(p - q) >= 70 for q in used_pitches):
                used_pitches.append(p)
                return p
        raise RuntimeError("pitch space exhausted; lower n_items")

    def add(media_type: str, payload: bytes) -> int:
        nonlocal mid
        rows.append(
            {
                "media_id": mid,
                "url": f"media://{media_type}/{mid}",
                "media_type": media_type,
                "payload": payload,
                "width": None,
                "height": None,
                "duration_ms": None,
            }
        )
        mid += 1
        return mid - 1

    n_dup_sources = int(n_items * dup_frac) // 2
    for i in range(n_dup_sources):
        if i % 2 == 0:  # image pair: brightness shift + tiny noise
            img = _synth_image(rng)
            a = add("image", encode_pnm(img))
            shifted = np.clip(
                img.astype(np.int16) + rng.randint(3, 10), 0, 255
            ).astype(np.uint8)
            noise = rng.randint(-1, 2, img.shape).astype(np.int16)
            dup = np.clip(shifted.astype(np.int16) + noise, 0, 255).astype(np.uint8)
            b = add("image", encode_pnm(dup))
        else:  # audio pair: amplitude-scaled copy (spectral hash invariant)
            pitch = fresh_pitch()
            state = rng.get_state()
            a = add("audio", _synth_wav(rng, pitch, amp=0.6))
            rng.set_state(state)  # same harmonic mix, different gain
            b = add("audio", _synth_wav(rng, pitch, amp=0.35))
        true_pairs.append((a, b))

    # undecodable payloads → ok=false error rows, never task failures
    add("image", b"\x89PNG\r\n\x1a\n not actually decodable here")
    add("audio", b"ID3 mp3-ish junk")
    add("video", b"\x00\x00\x00 ftypisom")

    while mid < n_items:  # distinct singletons
        if rng.rand() < 0.5:
            add("image", encode_pnm(_synth_image(rng)))
        else:
            add("audio", _synth_wav(rng, fresh_pitch()))

    media = pd.DataFrame(rows)
    pairs = pd.DataFrame(true_pairs, columns=["media_id_a", "media_id_b"])
    return media, pairs

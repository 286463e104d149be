"""Trained document-quality classifier (r8).

Replaces the last heuristic-weights scorer in the pipeline: where
``quality_score``'s composite used hand-picked 0.4/0.3/0.3 weights
(the C4/Gopher-style rule of thumb), this module TRAINS a logistic
model on the same engineered feature set against an embedded
seed-labeled corpus (prose vs. boilerplate/spam/gibberish) at import
time — no external package, no network, fully deterministic. Same
pattern as ``langid_model.py`` (the r7 graduation of lang_id).

Model shape is chosen for BOTH engines of the correctness gate:

- Features are INTEGER-quantized at scoring time: capped token count
  plus stop/punct/mean-word-length ratios rounded at 4 decimals and
  scaled to integers (the exact ratio expressions t27 already proves
  hash-identical across Spark and DuckDB).
- Weights are integers too, so the decision score is a pure BIGINT
  dot product ``B + Σ W_i·f_i`` — no float drift, no libm sigmoid;
  ``keep`` is ``score > 0`` (= probability > 0.5). The integer score
  IS the model (training quantizes once; the Python reference, the
  Spark plan and the DuckDB oracle all evaluate the same integers).
- Scoring in Spark is pure whole-stage codegen: the features are the
  projections ``quality_score`` already computes; the dot product is
  four integer multiply-adds. Zero shuffle, zero UDF, zero joins.

Training: full-batch gradient descent on normalized float features
(deterministic: zero init, fixed epochs/learning rate, no RNG
anywhere), then one quantization pass. Seed corpus: short everyday
prose (label 1) vs. keyword stuffing, navigation boilerplate, symbol
soup, repeated-token spam and gibberish (label 0), authored for this
repo; held-out samples are used only by tests.
"""

from __future__ import annotations

import re
from functools import lru_cache

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is")
PUNCT = ".,;:!?"
TOK_CAP = 200  # length feature saturates here (t27's /100 knee, doubled)

GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "she walked to the market in the morning and bought fresh bread for the family",
    "we are going to visit our friends this weekend if the weather stays warm",
    "children love playing outside during the long summer days, and they come home tired.",
    "he reads the newspaper every day after breakfast with a cup of coffee",
    "the train arrives at the station exactly on time each evening.",
    "there is nothing better than a warm meal on a cold winter night",
    "many people enjoy walking along the beach at sunset in the quiet hours",
    "the teacher explained the lesson again so everyone could understand it properly",
    "it was raining all night, but the morning turned out bright and clear.",
    "please remember to close the window before you leave the house today",
    "my brother works in a small shop near the old town square, selling books.",
    "the library opens early and stays open until late in the evening for students",
    "they have been living in this city for more than ten years now",
    "would you like another cup of tea, or perhaps a glass of water?",
    "the mountain road was narrow and the view from the top was breathtaking",
    "every sunday the family gathers for a long lunch in the garden",
    "i think we should ask someone who knows the way to the harbor",
    "the letter arrived two weeks after it was sent from abroad, slightly torn.",
    "good ideas often come when you least expect them to appear",
    "a gentle wind moved through the trees while the birds settled for the night",
    "the committee reviewed the proposal and agreed to fund the new playground",
    "after the storm passed, neighbors helped each other clear the fallen branches",
    "the recipe calls for two eggs, a cup of flour, and a pinch of salt.",
    "scientists measured the river's depth at several points along its course",
    "the museum's new wing holds paintings collected over three generations",
    "he fixed the old bicycle and gave it to the boy next door",
    "the meeting ran long, but in the end everyone agreed on the plan.",
    "a small café at the corner serves the best soup in the neighborhood",
    "the garden needs watering twice a week during the dry season",
]

JUNK = [
    "buy cheap shoes buy cheap shoes best price best price best price click now",
    "home | about | contact | privacy | terms | login | register | sitemap",
    ":: >> || @@ ## $$ %% ^^ && ** (( )) {{ }} [[ ]] <<",
    "spam spam spam spam spam spam spam spam spam spam spam spam",
    "xkqwz plvnb trgfd mnbvc qazws edcrf tgbyh ujmik olpqa zsxdc",
    "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20",
    "click here",
    "!!!!!! ?????? ...... ;;;;;; :::::: ,,,,,,",
    "FREE FREE FREE WIN WIN WIN NOW NOW NOW CASH CASH CASH PRIZE PRIZE",
    "lorem9 ipsum7 dolor3 sit1 amet8 consectetur2 adipiscing5 elit4 sed0 do6",
    "accept cookies | manage preferences | reject all | cookie policy | settings",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb",
    "download download download mp3 mp3 mp3 free free free online online",
    "qwertyuiop asdfghjkl zxcvbnm qwertyuiop asdfghjkl zxcvbnm qwerty",
    "404 403 500 302 301 200 201 204 206 101 100 418 503 504 505",
    "next page previous page first page last page page 1 page 2 page 3",
    "copyright c 2024 all rights reserved trademark tm registered r",
    "xx yy zz xx yy zz xx yy zz xx yy zz xx yy zz xx yy zz",
    "subscribe newsletter subscribe newsletter subscribe newsletter signup",
    "item item item item item item item item item item item item item",
    "v1.2.3 v1.2.4 v1.2.5 v1.3.0 v2.0.0 v2.0.1 v2.1.0 v3.0.0-beta.1",
    "tags: cheap, discount, sale, offer, deal, promo, coupon, code, free",
    "..... ----- _____ ===== +++++ ***** ///// \\\\\\\\ ~~~~~ `````",
    "ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok ok",
]

# held-out samples for tests (NOT in the training lists above)
HELDOUT_GOOD = [
    "yesterday evening we watched the ships come slowly into the harbor "
    "while the children asked question after question about the sea",
    "the baker sets out warm loaves at dawn, and the street fills with "
    "the smell of fresh bread before the shops open.",
]
HELDOUT_JUNK = [
    "best deal best deal best deal order now order now limited offer "
    "limited offer discount discount discount",
    "menu | search | cart | checkout | wishlist | account | help | faq",
]

# Java's \s (Spark regexp_replace) is the ASCII class [ \t\n\x0B\f\r];
# Python's re \s would also eat unicode spaces and silently diverge.
_JAVA_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def _round_half_up(x: float) -> int:
    """Spark's ROUND is HALF_UP and DuckDB's rounds half away from
    zero — identical for the non-negative ratios here. Python's
    built-in ``round`` is half-to-even and WOULD diverge at exact .5
    quantization boundaries (e.g. stop_hits/n_tok = 1/32 → 312.5).

    Rounds via decimal semantics on the double's shortest repr —
    exactly what Spark's ROUND does (BigDecimal.valueOf(double) is
    Double.toString + HALF_UP). The earlier floor(x + 0.5) form
    disagreed one ulp below a .5 boundary (0.49999999999999994 +
    0.5 rounds UP to 1.0 in binary, so floor gave 1 where both
    engines give 0)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def features(text: str) -> tuple[int, int, int, int]:
    """Integer-quantized t27 feature vector, mirroring the Spark
    expressions character-for-character:

      f_len   = least(n_tok, TOK_CAP)            (whitespace tokens of
                                                  the normalized text)
      f_stop  = round(stop_hits / n_tok * 10000)
      f_punct = round(punct_chars / n_char * 10000)  (RAW text)
      f_mwl   = round(mean_word_len * 10000)
    """
    # mirror normalized() exactly: F.trim strips ONLY spaces (not \r
    # etc. — str.strip() would), then lower, then Java-\s+ squeeze
    norm = _JAVA_WS_RE.sub(" ", text.strip(" ").lower())
    toks = norm.split(" ")
    n_tok = len(toks)
    n_char = len(text)
    stop_hits = sum(1 for w in toks if w in STOPWORDS)
    punct = sum(1 for c in text if c in PUNCT)
    tok_chars = sum(len(w) for w in toks)
    f_len = min(n_tok, TOK_CAP)
    f_stop = _round_half_up(stop_hits / n_tok * 10000) if n_tok > 0 else 0
    f_punct = _round_half_up(punct / n_char * 10000) if n_char > 0 else 0
    f_mwl = _round_half_up(tok_chars / n_tok * 10000) if n_tok > 0 else 0
    return (f_len, f_stop, f_punct, f_mwl)


# float-feature scales used during training (features → roughly [0, 1])
_SCALES = (float(TOK_CAP), 10000.0, 10000.0, 100000.0)
_EPOCHS = 2000
_LR = 1.0


@lru_cache(maxsize=1)
def train() -> tuple[int, tuple[int, int, int, int]]:
    """→ (B, (W_len, W_stop, W_punct, W_mwl)): integer bias/weights of
    the quantized logistic model. ``score > 0`` ⇔ p(quality) > 0.5.
    The integer score is ~logit × 10⁶."""
    import numpy as np

    raw = [features(t) for t in GOOD] + [features(t) for t in JUNK]
    y = np.array([1.0] * len(GOOD) + [0.0] * len(JUNK))
    x = np.array(raw, dtype=np.float64) / np.array(_SCALES)
    w = np.zeros(4)
    b = 0.0
    for _ in range(_EPOCHS):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= _LR * (x.T @ g) / len(y)
        b -= _LR * g.mean()
    # quantize onto the INTEGER feature units: logit = b + Σ wᵢ·(fᵢ/sᵢ)
    # → score_m = round(b·10⁶) + Σ round(wᵢ·10⁶/sᵢ)·fᵢ
    ws = tuple(int(round(wi * 1_000_000 / s)) for wi, s in zip(w, _SCALES))
    return int(round(b * 1_000_000)), ws


def score_doc(text: str) -> int:
    """Pure-Python reference scorer (integer logit-millionths) —
    documentation of the exact semantics the Spark plan and DuckDB
    oracle replicate."""
    b, ws = train()
    f = features(text)
    return b + sum(wi * fi for wi, fi in zip(ws, f))


def is_quality(text: str) -> bool:
    return score_doc(text) > 0

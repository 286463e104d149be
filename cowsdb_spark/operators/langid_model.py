"""Char-trigram Naive Bayes language-ID model (r7).

Replaces the r1-r6 marker-word heuristic with the real algorithm a
training-data pipeline uses (langid.py / fastText's core idea at its
smallest): per-language character-trigram log-likelihoods with Laplace
smoothing, trained at import time on the embedded seed corpus below —
no external package, no network, fully deterministic.

Model shape is chosen for BOTH engines of the correctness gate:

- Weights are INTEGER milli-log10 probabilities (``round(log10(p) *
  10000)``), so Spark and the DuckDB oracle sum exact BIGINTs — no
  float drift can split the argmax.
- The vocabulary is the union of each language's top-K trigrams, and
  the table is the COMPLETE vocab x language cross product (a language
  missing a gram gets its smoothed floor, not an implicit 0 — an
  implicit 0 would *favor* the language with no evidence).
- Scoring is a broadcast join: explode doc trigrams, join the model,
  sum weights per (doc, lang), argmax with a deterministic tie-break
  (score DESC, lang ASC). At 100 TB this is a map-side join + one
  partial-aggregated shuffle on doc_id — the scale path; the model is
  a few thousand rows.

Seed corpus: ordinary sentences authored for this repo (public
everyday vocabulary), ~25 per language, with held-out samples used by
tests only.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

TOP_K = 128  # trigrams kept per language before the union

# --- embedded seed corpus (training half) ---------------------------
SEED = {
    "en": (
        "the quick brown fox jumps over the lazy dog near the river. "
        "she walked to the market in the morning and bought fresh bread. "
        "we are going to visit our friends this weekend if the weather holds. "
        "children love playing outside during the long summer days. "
        "he reads the newspaper every day after breakfast with coffee. "
        "the train arrives at the station exactly on time each evening. "
        "there is nothing better than a warm meal on a cold night. "
        "many people enjoy walking along the beach at sunset. "
        "the teacher explained the lesson again so everyone could understand. "
        "it was raining all night but the morning turned out bright and clear. "
        "please remember to close the window before you leave the house. "
        "my brother works in a small shop near the old town square. "
        "the library opens early and stays open until late in the evening. "
        "they have been living in this city for more than ten years. "
        "would you like another cup of tea or perhaps some water. "
        "the mountain road was narrow and the view was breathtaking. "
        "every sunday the family gathers for a long lunch together. "
        "i think we should ask someone who knows the way to the harbor. "
        "the letter arrived two weeks after it was sent from abroad. "
        "good ideas often come when you least expect them to appear."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund am fluss. "
        "sie ging am morgen zum markt und kaufte frisches brot. "
        "wir besuchen am wochenende unsere freunde wenn das wetter gut bleibt. "
        "die kinder spielen gern draußen an den langen sommertagen. "
        "er liest jeden tag nach dem frühstück die zeitung mit kaffee. "
        "der zug kommt jeden abend pünktlich am bahnhof an. "
        "es gibt nichts besseres als eine warme mahlzeit in einer kalten nacht. "
        "viele menschen gehen gern bei sonnenuntergang am strand spazieren. "
        "die lehrerin erklärte die aufgabe noch einmal damit alle sie verstehen. "
        "es hat die ganze nacht geregnet aber der morgen wurde hell und klar. "
        "bitte denk daran das fenster zu schließen bevor du das haus verlässt. "
        "mein bruder arbeitet in einem kleinen laden in der altstadt. "
        "die bibliothek öffnet früh und bleibt bis spät am abend geöffnet. "
        "sie wohnen seit mehr als zehn jahren in dieser stadt. "
        "möchtest du noch eine tasse tee oder vielleicht etwas wasser. "
        "die bergstraße war schmal und die aussicht war atemberaubend. "
        "jeden sonntag trifft sich die familie zu einem langen mittagessen. "
        "ich denke wir sollten jemanden fragen der den weg zum hafen kennt. "
        "der brief kam zwei wochen nachdem er aus dem ausland geschickt wurde. "
        "gute ideen kommen oft wenn man sie am wenigsten erwartet."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux près de la rivière. "
        "elle est allée au marché le matin et a acheté du pain frais. "
        "nous allons rendre visite à nos amis ce week-end si le temps le permet. "
        "les enfants aiment jouer dehors pendant les longues journées d'été. "
        "il lit le journal chaque jour après le petit déjeuner avec un café. "
        "le train arrive à la gare exactement à l'heure chaque soir. "
        "il n'y a rien de mieux qu'un repas chaud par une nuit froide. "
        "beaucoup de gens aiment marcher le long de la plage au coucher du soleil. "
        "la professeure a expliqué la leçon encore une fois pour que tout le monde comprenne. "
        "il a plu toute la nuit mais le matin était clair et lumineux. "
        "n'oublie pas de fermer la fenêtre avant de quitter la maison. "
        "mon frère travaille dans un petit magasin près de la vieille place. "
        "la bibliothèque ouvre tôt et reste ouverte jusque tard le soir. "
        "ils habitent dans cette ville depuis plus de dix ans. "
        "voudrais tu une autre tasse de thé ou peut être un peu d'eau. "
        "la route de montagne était étroite et la vue était magnifique. "
        "chaque dimanche la famille se réunit pour un long déjeuner. "
        "je pense que nous devrions demander à quelqu'un qui connaît le chemin du port. "
        "la lettre est arrivée deux semaines après avoir été envoyée de l'étranger. "
        "les bonnes idées viennent souvent quand on s'y attend le moins."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso cerca del río. "
        "ella fue al mercado por la mañana y compró pan fresco. "
        "vamos a visitar a nuestros amigos este fin de semana si el tiempo lo permite. "
        "a los niños les encanta jugar afuera durante los largos días de verano. "
        "él lee el periódico todos los días después del desayuno con café. "
        "el tren llega a la estación exactamente a tiempo cada tarde. "
        "no hay nada mejor que una comida caliente en una noche fría. "
        "a mucha gente le gusta caminar por la playa al atardecer. "
        "la maestra explicó la lección otra vez para que todos pudieran entender. "
        "llovió toda la noche pero la mañana resultó clara y luminosa. "
        "por favor recuerda cerrar la ventana antes de salir de la casa. "
        "mi hermano trabaja en una tienda pequeña cerca de la plaza vieja. "
        "la biblioteca abre temprano y permanece abierta hasta tarde. "
        "ellos viven en esta ciudad desde hace más de diez años. "
        "quieres otra taza de té o quizás un poco de agua. "
        "el camino de montaña era estrecho y la vista era impresionante. "
        "cada domingo la familia se reúne para un largo almuerzo. "
        "creo que deberíamos preguntar a alguien que conozca el camino al puerto. "
        "la carta llegó dos semanas después de ser enviada desde el extranjero. "
        "las buenas ideas llegan a menudo cuando menos se las espera."
    ),
}

# held-out samples for tests (NOT in the training text above)
HELDOUT = {
    "en": "yesterday evening we watched the ships come slowly into the harbor while the children asked question after question about the sea",
    "de": "gestern abend schauten wir den schiffen zu wie sie langsam in den hafen kamen während die kinder immer neue fragen über das meer stellten",
    "fr": "hier soir nous avons regardé les bateaux entrer lentement dans le port pendant que les enfants posaient question après question sur la mer",
    "es": "ayer por la tarde miramos los barcos entrar despacio en el puerto mientras los niños hacían pregunta tras pregunta sobre el mar",
}

LANGS = tuple(sorted(SEED))  # ('de', 'en', 'es', 'fr')

_WS_RE = re.compile(r" +")


def normalize(text: str) -> str:
    """lower → letters+spaces only → collapse runs → trim.

    Mirrors the Spark/DuckDB expression used at scoring time
    (``regexp_replace(lower(t), '[^\\p{L} ]', ' ')`` etc.) — the three
    implementations must agree character-for-character.  ``\\p{L}`` is
    Unicode category L* in both Java and RE2, which is exactly
    ``str.isalpha`` — stdlib ``\\w`` would also admit digits/underscore.
    """
    t = "".join(c if c.isalpha() or c == " " else " " for c in text.lower())
    return _WS_RE.sub(" ", t).strip()


def trigrams(norm: str) -> list[str]:
    return [norm[i:i + 3] for i in range(len(norm) - 2)] if len(norm) >= 3 else []


@lru_cache(maxsize=1)
def train() -> list[tuple[str, str, int]]:
    """→ [(gram, lang, milli_log10_prob)] over the full vocab×lang cross."""
    counts: dict[str, dict[str, int]] = {}
    totals: dict[str, int] = {}
    for lang, text in SEED.items():
        c: dict[str, int] = {}
        for g in trigrams(normalize(text)):
            c[g] = c.get(g, 0) + 1
        counts[lang] = c
        totals[lang] = sum(c.values())
    vocab: set[str] = set()
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        vocab.update(g for g, _ in top)
    v = len(vocab)
    model = []
    for g in sorted(vocab):
        for lang in LANGS:
            p = (counts[lang].get(g, 0) + 1) / (totals[lang] + v)
            model.append((g, lang, round(math.log10(p) * 10000)))
    return model


def score_text(text: str) -> str:
    """Pure-Python reference scorer (tests + documentation of the
    exact semantics the Spark plan and DuckDB oracle replicate)."""
    m = {}
    for g, lang, w in train():
        m.setdefault(g, {})[lang] = w
    scores = {lang: 0 for lang in LANGS}
    hit = False
    for g in trigrams(normalize(text)):
        if g in m:
            hit = True
            for lang, w in m[g].items():
                scores[lang] += w
    if not hit:
        return "und"
    # deterministic argmax: score DESC, lang ASC
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]


def oracle_values() -> str:
    """The model as a DuckDB VALUES list (gram, lang_m, w)."""
    return ", ".join(
        "('" + g.replace("'", "''") + f"', '{lang}', {w})"
        for g, lang, w in train()
    )


def model_pdf():
    """The model as a pandas frame for localdf → broadcast join."""
    import pandas as pd

    rows = train()
    return pd.DataFrame(
        {
            "gram": [r[0] for r in rows],
            "lang_m": [r[1] for r in rows],
            "w": [r[2] for r in rows],
        }
    )

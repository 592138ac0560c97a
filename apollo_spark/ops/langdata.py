"""In-tree multilingual fixture with REAL lexical signal (round 9).

The driver's synthetic `documents` corpus is measured label-independent
(SURVEY round 7: per-language token distributions converge as N grows), so
the trained language-ID classifier can only MEMORIZE its labeled slice
there. This module provides the missing demonstration corpus: a small,
deterministic, public-knowledge multilingual sentence set (five languages)
whose text genuinely carries the label signal, built the way real language
signal works — language-specific FUNCTION-WORD SKELETONS (articles,
copulas, prepositions: "the X is Y" / "der X ist Y" / "le X est Y") with
varying content slots. A held-out sentence shares skeleton token-trigrams
with training sentences it has never seen, which is exactly what the
hashed-trigram perceptron (ops.ml, the fastText recipe) needs to
generalize — and exactly what the synthetic corpus lacks.

All vocabulary is common-knowledge basic wordlist material (the hundred
most common words of each language); sentences are template expansions,
not quotations. ASCII-folded spellings keep the fixture
tokenizer-trivial; language ID at this granularity rides function words,
not diacritics.

tests/test_langid_fixture.py trains the SAME multiclass_perceptron_train
pipeline the registry queries use on a deterministic train split and pins
held-out accuracy + diagonal-dominant confusion on unseen docs.
"""

from __future__ import annotations

import random

# per-language content-word banks (basic common-knowledge vocabulary)
_BANKS: dict[str, dict[str, list[str]]] = {
    "en": {
        "noun": ["house", "dog", "river", "book", "child", "city", "garden", "friend"],
        "adj": ["small", "old", "bright", "quiet", "green", "happy"],
        "verb": ["sees", "finds", "loves", "brings", "follows", "watches"],
    },
    "de": {
        "noun": ["haus", "hund", "fluss", "buch", "kind", "stadt", "garten", "freund"],
        "adj": ["klein", "alt", "hell", "ruhig", "gruen", "froh"],
        "verb": ["sieht", "findet", "liebt", "bringt", "folgt", "beobachtet"],
    },
    "fr": {
        "noun": ["maison", "chien", "fleuve", "livre", "enfant", "ville", "jardin", "ami"],
        "adj": ["petit", "vieux", "clair", "calme", "vert", "heureux"],
        "verb": ["voit", "trouve", "aime", "apporte", "suit", "regarde"],
    },
    "es": {
        "noun": ["casa", "perro", "rio", "libro", "nino", "ciudad", "jardin", "amigo"],
        "adj": ["pequeno", "viejo", "claro", "tranquilo", "verde", "feliz"],
        "verb": ["ve", "encuentra", "ama", "trae", "sigue", "mira"],
    },
    "it": {
        "noun": ["casa", "cane", "fiume", "libro", "bambino", "citta", "giardino", "amico"],
        "adj": ["piccolo", "vecchio", "chiaro", "tranquillo", "verde", "felice"],
        "verb": ["vede", "trova", "ama", "porta", "segue", "guarda"],
    },
}

# function-word skeletons: {slots} are content picks, everything else is the
# language's high-frequency glue — the part that recurs across sentences and
# carries the trigram signal a linear model generalizes from
_TEMPLATES: dict[str, list[str]] = {
    "en": [
        "the {noun} is {adj} and the {noun} is {adj}",
        "a {adj} {noun} {verb} the {noun} near the river",
        "every {noun} {verb} a {adj} {noun} in the {noun}",
        "she {verb} the {noun} because the {noun} is {adj}",
        "they say that the {noun} {verb} the {adj} {noun}",
        "there is a {adj} {noun} behind the old {noun}",
    ],
    "de": [
        "das {noun} ist {adj} und das {noun} ist {adj}",
        "ein {adj} {noun} {verb} das {noun} an dem fluss",
        "jedes {noun} {verb} ein {adj} {noun} in dem {noun}",
        "sie {verb} das {noun} weil das {noun} {adj} ist",
        "man sagt dass das {noun} das {adj} {noun} {verb}",
        "es gibt ein {adj} {noun} hinter dem alten {noun}",
    ],
    "fr": [
        "le {noun} est {adj} et le {noun} est {adj}",
        "un {noun} {adj} {verb} le {noun} pres du fleuve",
        "chaque {noun} {verb} un {noun} {adj} dans le {noun}",
        "elle {verb} le {noun} parce que le {noun} est {adj}",
        "on dit que le {noun} {verb} le {noun} {adj}",
        "il y a un {noun} {adj} derriere le vieux {noun}",
    ],
    "es": [
        "la {noun} es {adj} y la {noun} es {adj}",
        "una {noun} {adj} {verb} la {noun} cerca del rio",
        "cada {noun} {verb} una {noun} {adj} en la {noun}",
        "ella {verb} la {noun} porque la {noun} es {adj}",
        "se dice que la {noun} {verb} la {noun} {adj}",
        "hay una {noun} {adj} detras de la vieja {noun}",
    ],
    "it": [
        "la {noun} e {adj} e la {noun} e {adj}",
        "una {noun} {adj} {verb} la {noun} vicino al fiume",
        "ogni {noun} {verb} una {noun} {adj} nella {noun}",
        "lei {verb} la {noun} perche la {noun} e {adj}",
        "si dice che la {noun} {verb} la {noun} {adj}",
        "ce una {noun} {adj} dietro la vecchia {noun}",
    ],
}

LANGS: tuple[str, ...] = tuple(sorted(_BANKS))


def multilingual_fixture_rows(
    n_per_lang: int = 120, seed: int = 7
) -> list[tuple[int, str, str]]:
    """Deterministic (doc_id, lang, text) rows: ``n_per_lang`` sentences per
    language, each a seeded template expansion (two clauses joined so docs
    run 10-20 tokens). Spanish/Italian deliberately share cognate content
    words and the "la" article — the realistic confusable pair; the
    function-word skeletons still separate them."""
    rng = random.Random(seed)
    rows: list[tuple[int, str, str]] = []
    doc_id = 0
    for lang in LANGS:
        banks, templates = _BANKS[lang], _TEMPLATES[lang]
        for _ in range(n_per_lang):
            parts = []
            for t in rng.sample(templates, 2):
                out = []
                for tok in t.split(" "):
                    if tok.startswith("{"):
                        out.append(rng.choice(banks[tok[1:-1]]))
                    else:
                        out.append(tok)
                parts.append(" ".join(out))
            rows.append((doc_id, lang, " ".join(parts)))
            doc_id += 1
    return rows


def multilingual_fixture_df(spark, n_per_lang: int = 120, seed: int = 7):
    """The fixture as a DataFrame in the documents-table shape the langid
    ops consume: (doc_id long, lang string, text string)."""
    return spark.createDataFrame(
        multilingual_fixture_rows(n_per_lang, seed), "doc_id long, lang string, text string"
    )


# --------------------------------------------------------------------------
# Quality axis (round 10): fluent vs degraded text with REAL signal.
#
# The synthetic driver corpus is label-independent, so the trained quality
# classifier could only memorize there (the same round-7 finding that
# motivated the multilingual fixture). This extension plants the two
# degradation modes a web crawl actually shows, built FROM THE SAME
# vocabulary banks so a classifier cannot cheat on content-word identity:
#
# * gibberish — the banks' content words sampled i.i.d. with the
#   function-word skeleton REMOVED: unigram soup. What separates it from
#   fluent text is exactly the high-frequency glue ("the", "is", "and",
#   articles/copulas) a bag-of-tokens model weights up — the real signal
#   quality classifiers (CCNet/Gopher-style) ride.
# * boilerplate — a handful of structural nav/footer lines repeated with
#   one varying slot: high repetition, navigation vocabulary.
# --------------------------------------------------------------------------

_BOILER_TEMPLATES: tuple[str, ...] = (
    "click here to subscribe to our {noun} newsletter and never miss an update",
    "copyright all rights reserved terms of service privacy policy {noun} sitemap",
    "home about products {noun} contact login register search menu",
    "cookie settings accept all manage preferences read our {noun} policy",
)


def quality_fixture_rows(
    n_pos: int = 150, n_per_neg: int = 75, seed: int = 11
) -> list[tuple[int, int, str, str]]:
    """Deterministic (doc_id, label, kind, text) rows for the quality axis:
    ``label`` 1 = keep (fluent English skeleton sentences from the same
    generator the langid fixture uses), 0 = drop (``kind`` "gibberish" |
    "boilerplate" negatives as documented above). Docs run 10-24 tokens,
    matching the positive length band so length alone cannot separate."""
    rng = random.Random(seed)
    banks, templates = _BANKS["en"], _TEMPLATES["en"]
    rows: list[tuple[int, int, str, str]] = []
    doc_id = 0
    for _ in range(n_pos):
        parts = []
        for t in rng.sample(templates, 2):
            out = []
            for tok in t.split(" "):
                out.append(rng.choice(banks[tok[1:-1]]) if tok.startswith("{") else tok)
            parts.append(" ".join(out))
        rows.append((doc_id, 1, "fluent", " ".join(parts)))
        doc_id += 1
    content = banks["noun"] + banks["adj"] + banks["verb"]
    for _ in range(n_per_neg):
        n_tok = rng.randint(12, 22)
        rows.append((doc_id, 0, "gibberish", " ".join(rng.choice(content) for _ in range(n_tok))))
        doc_id += 1
    for _ in range(n_per_neg):
        t = rng.choice(_BOILER_TEMPLATES)
        text = t.replace("{noun}", rng.choice(banks["noun"]))
        rows.append((doc_id, 0, "boilerplate", text))
        doc_id += 1
    return rows


def quality_fixture_df(spark, n_pos: int = 150, n_per_neg: int = 75, seed: int = 11):
    """The quality fixture as a DataFrame: (doc_id long, label int,
    kind string, text string)."""
    return spark.createDataFrame(
        quality_fixture_rows(n_pos, n_per_neg, seed),
        "doc_id long, label int, kind string, text string",
    )

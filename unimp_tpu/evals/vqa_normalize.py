r"""Official VQA answer normalization + OK-VQA stemming (hermetic).

The VQA v2 accuracy metric is DEFINED by its normalization pipeline: a
contractions table, a number-word map, an articles list, a punctuation
pass and a digit/article pass, applied to both the prediction and every
human answer before the leave-one-out consensus min(matches/3, 1).
This module reproduces that pipeline exactly (semantics and quirks):

  * data tables + passes: /root/reference/UniMP/pipeline/eval/vqa_metric.py:218-470
    (themselves the official VQA toolkit tables — metric-definition
    data, reproduced verbatim because the metric is the data)
  * accuracy protocol:    vqa_metric.py:383-445 (VQAEval.evaluate —
    normalization is applied only when the human answers disagree,
    and each answer is scored against the OTHER nine)
  * generation split:     vqa_metric.py (postprocess_vqa_generation)
  * OK-VQA stemming:      /root/reference/UniMP/pipeline/eval/ok_vqa_utils.py:1-214

Reproduced quirks (golden-tested against literal ports in
tests/test_benchmark_harness.py):

  * ``periodStrip.sub("", text, re.UNICODE)`` passes re.UNICODE (== 32)
    as the COUNT argument — at most 32 periods are stripped.
  * the period regex ``(?!<=\d)(\.)(?!\d)`` spells a lookahead where a
    lookbehind was meant, so "1.5" keeps its dot but ".5" loses it.
  * punctuation chars are deleted outright (not spaced) when adjacent
    to a space in the ORIGINAL string or when the string contains a
    digit,digit comma; otherwise they are replaced by a space.
  * the reference's ``manualMap.setdefault(word, word)`` inserts every
    unseen word into the map; ``dict.get(word, word)`` is the same
    function without the mutation.

The OK-VQA stemmer in the reference runs nltk pos_tag/word_tokenize +
WordNet lemmatization + ``inflection.singularize``. Neither the nltk
corpora nor ``inflection`` exist in this hermetic environment, so
``okvqa_stem`` reimplements the same decision procedure (manual-match
table first, then -ing verb lemmatization, then plural-noun
singularization) with rule-based fallbacks in place of the lexicon
lookups; the manual table — which exists precisely because the
automatic rules misfire — is reproduced in full, so the cases the
OK-VQA authors cared enough to pin behave identically.
"""

from __future__ import annotations

import re
from typing import List, Sequence

# ---- metric-definition data (vqa_metric.py:218-381) ----

CONTRACTIONS = {
    "aint": "ain't",
    "arent": "aren't",
    "cant": "can't",
    "couldve": "could've",
    "couldnt": "couldn't",
    "couldn'tve": "couldn't've",
    "couldnt've": "couldn't've",
    "didnt": "didn't",
    "doesnt": "doesn't",
    "dont": "don't",
    "hadnt": "hadn't",
    "hadnt've": "hadn't've",
    "hadn'tve": "hadn't've",
    "hasnt": "hasn't",
    "havent": "haven't",
    "hed": "he'd",
    "hed've": "he'd've",
    "he'dve": "he'd've",
    "hes": "he's",
    "howd": "how'd",
    "howll": "how'll",
    "hows": "how's",
    "Id've": "I'd've",
    "I'dve": "I'd've",
    "Im": "I'm",
    "Ive": "I've",
    "isnt": "isn't",
    "itd": "it'd",
    "itd've": "it'd've",
    "it'dve": "it'd've",
    "itll": "it'll",
    "let's": "let's",
    "maam": "ma'am",
    "mightnt": "mightn't",
    "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've",
    "mightve": "might've",
    "mustnt": "mustn't",
    "mustve": "must've",
    "neednt": "needn't",
    "notve": "not've",
    "oclock": "o'clock",
    "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at",
    "'ows'at": "'ow's'at",
    "'ow'sat": "'ow's'at",
    "shant": "shan't",
    "shed've": "she'd've",
    "she'dve": "she'd've",
    "she's": "she's",
    "shouldve": "should've",
    "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've",
    "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd",
    "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've",
    "somebodyll": "somebody'll",
    "somebodys": "somebody's",
    "someoned": "someone'd",
    "someoned've": "someone'd've",
    "someone'dve": "someone'd've",
    "someonell": "someone'll",
    "someones": "someone's",
    "somethingd": "something'd",
    "somethingd've": "something'd've",
    "something'dve": "something'd've",
    "somethingll": "something'll",
    "thats": "that's",
    "thered": "there'd",
    "thered've": "there'd've",
    "there'dve": "there'd've",
    "therere": "there're",
    "theres": "there's",
    "theyd": "they'd",
    "theyd've": "they'd've",
    "they'dve": "they'd've",
    "theyll": "they'll",
    "theyre": "they're",
    "theyve": "they've",
    "twas": "'twas",
    "wasnt": "wasn't",
    "wed've": "we'd've",
    "we'dve": "we'd've",
    "weve": "we've",
    "werent": "weren't",
    "whatll": "what'll",
    "whatre": "what're",
    "whats": "what's",
    "whatve": "what've",
    "whens": "when's",
    "whered": "where'd",
    "wheres": "where's",
    "whereve": "where've",
    "whod": "who'd",
    "whod've": "who'd've",
    "who'dve": "who'd've",
    "wholl": "who'll",
    "whos": "who's",
    "whove": "who've",
    "whyll": "why'll",
    "whyre": "why're",
    "whys": "why's",
    "wont": "won't",
    "wouldve": "would've",
    "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've",
    "wouldn'tve": "wouldn't've",
    "yall": "y'all",
    "yall'll": "y'all'll",
    "y'allll": "y'all'll",
    "yall'd've": "y'all'd've",
    "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've",
    "youd": "you'd",
    "youd've": "you'd've",
    "you'dve": "you'd've",
    "youll": "you'll",
    "youre": "you're",
    "youve": "you've",
}

MANUAL_MAP = {
    "none": "0",
    "zero": "0",
    "one": "1",
    "two": "2",
    "three": "3",
    "four": "4",
    "five": "5",
    "six": "6",
    "seven": "7",
    "eight": "8",
    "nine": "9",
    "ten": "10",
}

ARTICLES = ["a", "an", "the"]

PUNCT = [
    ";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\", "_",
    "-", ">", "<", "@", "`", ",", "?", "!",
]

_PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
_COMMA_STRIP = re.compile(r"(\d)(\,)(\d)")


# ---- normalization passes (vqa_metric.py:447-470) ----


def process_punctuation(text: str) -> str:
    """processPunctuation (vqa_metric.py:447-456), quirks included."""
    out = text
    for p in PUNCT:
        if (p + " " in text or " " + p in text) or (
            _COMMA_STRIP.search(text) is not None
        ):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    # the reference passes re.UNICODE (== 32) as sub()'s COUNT argument
    out = _PERIOD_STRIP.sub("", out, re.UNICODE)
    return out


def process_digit_article(text: str) -> str:
    """processDigitArticle (vqa_metric.py:458-470): lowercase, map
    number words to digits, drop articles, expand contractions."""
    out = []
    for word in text.lower().split():
        word = MANUAL_MAP.get(word, word)
        if word not in ARTICLES:
            out.append(word)
    for i, word in enumerate(out):
        if word in CONTRACTIONS:
            out[i] = CONTRACTIONS[word]
    return " ".join(out)


def clean_answer(text: str) -> str:
    """Whitespace canonicalization applied to every answer before the
    (conditional) normalization passes (vqa_metric.py:398-406)."""
    return text.replace("\n", " ").replace("\t", " ").strip()


def normalize_answer(text: str) -> str:
    """Full pipeline: clean -> punctuation -> digit/article."""
    return process_digit_article(process_punctuation(clean_answer(text)))


def postprocess_vqa_generation(prediction: str) -> str:
    """Cut the generation at the first "Question"/"Answer" marker
    (vqa_metric.py postprocess_vqa_generation)."""
    return re.split("Question|Answer", prediction, 1)[0]


def vqa_accuracy(prediction: str, answers: Sequence[str]) -> float:
    """Official VQA accuracy for one question (VQAEval.evaluate,
    vqa_metric.py:383-445): each human answer is scored by how many of
    the OTHER answers match the prediction (min(matches/3, 1)), and the
    per-answer scores are averaged. The punctuation + digit/article
    passes run only when the human answers disagree — unanimous
    questions compare cleaned-but-unnormalized strings, exactly like
    the reference."""
    if not answers:
        return 0.0
    pred = clean_answer(prediction)
    gts = [clean_answer(a) for a in answers]
    if len(set(gts)) > 1:
        pred = process_digit_article(process_punctuation(pred))
        gts = [process_digit_article(process_punctuation(a)) for a in gts]
    accs = []
    for i in range(len(gts)):
        matches = sum(1 for j, a in enumerate(gts) if j != i and a == pred)
        accs.append(min(1.0, matches / 3.0))
    return float(sum(accs) / len(accs))


# ---- OK-VQA stemming (ok_vqa_utils.py:1-214) ----

# Manual stemming table from the OK-VQA release: words the automatic
# rules would map incorrectly, pinned to their expected stems
# (ok_vqa_utils.py:15-188 — metric-definition data, reproduced in full).
OKVQA_MANUAL_MATCHES = {
    "police": "police",
    "las": "las",
    "vegas": "vegas",
    "yes": "yes",
    "jeans": "jean",
    "hell's": "hell",
    "domino's": "domino",
    "morning": "morn",
    "clothes": "cloth",
    "are": "are",
    "riding": "ride",
    "leaves": "leaf",
    "dangerous": "danger",
    "clothing": "cloth",
    "texting": "text",
    "kiting": "kite",
    "firefighters": "firefight",
    "ties": "tie",
    "married": "married",
    "teething": "teeth",
    "gloves": "glove",
    "tennis": "tennis",
    "dining": "dine",
    "directions": "direct",
    "waves": "wave",
    "christmas": "christmas",
    "drives": "drive",
    "pudding": "pud",
    "coding": "code",
    "plating": "plate",
    "quantas": "quanta",
    "hornes": "horn",
    "graves": "grave",
    "mating": "mate",
    "paned": "pane",
    "alertness": "alert",
    "sunbathing": "sunbath",
    "tenning": "ten",
    "wetness": "wet",
    "urinating": "urine",
    "sickness": "sick",
    "braves": "brave",
    "firefighting": "firefight",
    "lenses": "lens",
    "reflections": "reflect",
    "backpackers": "backpack",
    "eatting": "eat",
    "designers": "design",
    "curiousity": "curious",
    "playfulness": "play",
    "blindness": "blind",
    "hawke": "hawk",
    "tomatoe": "tomato",
    "rodeoing": "rodeo",
    "brightness": "bright",
    "circuses": "circus",
    "skateboarders": "skateboard",
    "staring": "stare",
    "electronics": "electron",
    "electicity": "elect",
    "mountainous": "mountain",
    "socializing": "social",
    "hamburgers": "hamburg",
    "caves": "cave",
    "transitions": "transit",
    "wading": "wade",
    "creame": "cream",
    "toileting": "toilet",
    "sautee": "saute",
    "buildings": "build",
    "belongings": "belong",
    "stockings": "stock",
    "walle": "wall",
    "cumulis": "cumuli",
    "travelers": "travel",
    "conducter": "conduct",
    "browsing": "brows",
    "pooping": "poop",
    "haircutting": "haircut",
    "toppings": "top",
    "hearding": "heard",
    "sunblocker": "sunblock",
    "bases": "base",
    "markings": "mark",
    "mopeds": "mope",
    "kindergartener": "kindergarten",
    "pies": "pie",
    "scrapbooking": "scrapbook",
    "couponing": "coupon",
    "meetings": "meet",
    "elevators": "elev",
    "lowes": "low",
    "men's": "men",
    "childrens": "children",
    "shelves": "shelve",
    "paintings": "paint",
    "raines": "rain",
    "paring": "pare",
    "expressions": "express",
    "routes": "rout",
    "pease": "peas",
    "vastness": "vast",
    "awning": "awn",
    "boy's": "boy",
    "drunkenness": "drunken",
    "teasing": "teas",
    "conferences": "confer",
    "ripeness": "ripe",
    "suspenders": "suspend",
    "earnings": "earn",
    "reporters": "report",
    "kid's": "kid",
    "containers": "contain",
    "corgie": "corgi",
    "porche": "porch",
    "microwaves": "microwave",
    "batter's": "batter",
    "sadness": "sad",
    "apartments": "apart",
    "oxygenize": "oxygen",
    "striping": "stripe",
    "purring": "pure",
    "professionals": "profession",
    "piping": "pipe",
    "farmer's": "farmer",
    "potatoe": "potato",
    "emirates": "emir",
    "womens": "women",
    "veteran's": "veteran",
    "wilderness": "wilder",
    "propellers": "propel",
    "alpes": "alp",
    "charioteering": "chariot",
    "swining": "swine",
    "illness": "ill",
    "crepte": "crept",
    "adhesives": "adhesive",
    "regent's": "regent",
    "decorations": "decor",
    "rabbies": "rabbi",
    "overseas": "oversea",
    "travellers": "travel",
    "casings": "case",
    "smugness": "smug",
    "doves": "dove",
    "nationals": "nation",
    "mustange": "mustang",
    "ringe": "ring",
    "gondoliere": "gondolier",
    "vacationing": "vacate",
    "reminders": "remind",
    "baldness": "bald",
    "settings": "set",
    "glaced": "glace",
    "coniferous": "conifer",
    "revelations": "revel",
    "personals": "person",
    "daughter's": "daughter",
    "badness": "bad",
    "projections": "project",
    "polarizing": "polar",
    "vandalizers": "vandal",
    "minerals": "miner",
    "protesters": "protest",
    "controllers": "control",
    "weddings": "wed",
    "sometimes": "sometime",
    "earing": "ear",
}

# Common -ing verbs whose stem restores a final "e" (the reference asks
# WordNet; hermetically we pin the frequent OK-VQA-answer cases not
# already covered by OKVQA_MANUAL_MATCHES).
_ING_RESTORES_E = {
    "making": "make", "taking": "take", "baking": "bake", "biking": "bike",
    "skating": "skate", "smiling": "smile", "driving": "drive",
    "diving": "dive", "waving": "wave", "hiking": "hike", "racing": "race",
    "dancing": "dance", "gliding": "glide", "sliding": "slide",
    "snowboarding": "snowboard", "surfing": "surf", "writing": "write",
    "giving": "give", "having": "have", "using": "use", "serving": "serve",
    "saving": "save", "moving": "move", "living": "live", "hiding": "hide",
    "sharing": "share", "caring": "care", "storing": "store",
    "posing": "pose", "closing": "close", "juicing": "juice",
    "tracing": "trace", "placing": "place", "waking": "wake",
    "joking": "joke", "smoking": "smoke", "poking": "poke",
    "decorating": "decorate", "celebrating": "celebrate",
    "exercising": "exercise", "grazing": "graze", "freezing": "freeze",
    "sneezing": "sneeze", "typing": "type", "hoping": "hope",
    "escaping": "escape", "scraping": "scrape", "shaving": "shave",
    "carving": "carve", "weaving": "weave",
}

_PLURAL_STOP = {
    "is", "was", "has", "its", "his", "hers", "this", "as", "us",
    "does", "goes", "gas", "bus", "plus", "lens", "chaos", "across",
}

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z0-9]+)*|[^\sA-Za-z0-9]")


def _singularize(word: str) -> str:
    """Rule-based stand-in for inflection.singularize on plural nouns."""
    if len(word) > 4 and word.endswith("ies"):
        return word[:-3] + "y"
    if word.endswith(("ches", "shes", "xes", "sses", "zes")):
        return word[:-2]
    if word.endswith("men") and len(word) > 3:
        return word[:-3] + "man"
    if word.endswith("s") and not word.endswith("ss"):
        return word[:-1]
    return word


def _lemmatize_ing(word: str) -> str:
    """Rule-based stand-in for WordNet verb lemmatization of -ing forms."""
    if word in _ING_RESTORES_E:
        return _ING_RESTORES_E[word]
    stem = word[:-3]
    if len(stem) < 2:
        return word
    # undouble a doubled final consonant (running -> run) except the
    # legitimately-doubled codas (spelling -> spell, hissing -> hiss)
    if (stem[-1] == stem[-2] and stem[-1] not in "aeiou"
            and not stem.endswith(("ll", "ss", "zz"))):
        return stem[:-1]
    return stem


def _looks_plural_noun(word: str) -> bool:
    return (
        len(word) > 3
        and word.endswith("s")
        and not word.endswith(("ss", "us", "is", "'s"))
        and word.isalpha()
        and word not in _PLURAL_STOP
    )


def okvqa_stem(text: str) -> str:
    """OKVQAStemmer.stem (ok_vqa_utils.py:190-206): per token, apply the
    manual table, else lemmatize -ing verbs, else singularize plural
    nouns. Tokens keep internal apostrophes so the table's possessive
    entries ("domino's" -> "domino") match directly — the reference's
    nltk word_tokenize splits possessives, which made those rows
    unreachable there; matching them is the table's documented intent."""
    out = []
    for w in _TOKEN_RE.findall(text):
        lw = w.lower()
        if w in OKVQA_MANUAL_MATCHES:
            w = OKVQA_MANUAL_MATCHES[w]
        elif lw in OKVQA_MANUAL_MATCHES:
            w = OKVQA_MANUAL_MATCHES[lw]
        elif w.endswith("ing"):
            w = _lemmatize_ing(w)
        elif _looks_plural_noun(lw):
            w = _singularize(w)
        out.append(w)
    return " ".join(out)


def postprocess_ok_vqa_generation(prediction: str) -> str:
    """Split at Question/Answer markers, then stem
    (ok_vqa_utils.py:211-214)."""
    return okvqa_stem(re.split("Question|Answer", prediction, 1)[0])

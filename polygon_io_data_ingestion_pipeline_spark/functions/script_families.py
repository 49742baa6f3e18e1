"""Intra-script language ID for the non-Latin top-crawl scripts.

Unicode-script counting (``operators/text.py:predicted_lang_script``)
labels every Cyrillic page ``ru``, every Arabic-script page ``ar`` and
every Devanagari page ``hi`` — but those scripts each carry several
top-15 crawl languages, and the engine's per-language stages (CCNet LM
terciles, NB training, per-language quality buckets) would pool
Ukrainian into the Russian bucket, Persian/Urdu into Arabic and
Marathi/Nepali into Hindi.  The same function-word frequency move that
separates the Latin languages (``.stopwords``) separates these: the
closed class of particles/copulas/postpositions is language-specific,
extremely frequent and topic-independent, and the scripts' orthography
differences make many of the strongest signals literally distinct
codepoints (Urdu ہ/ی vs Arabic ه/ي, Ukrainian і/є/ї vs Russian и/е).

Tables below are committed snapshots of approximate per-1000-running-
word frequencies from public word-frequency lists (Leipzig Corpora /
OpenSubtitles class of data) — the same discipline as the Latin tables
and the PSL snapshot.  Closely related pairs deliberately carry their
mutual DISCRIMINATORS (ru и/что/это vs uk і/що/це; bg да/е/това vs sr
је/су/што; hi है/के vs mr आहे/आणि vs ne छ/र) so page-length text
separates cleanly.

TOKENIZER: these families split on ``[^\\p{L}\\p{M}]+`` — combining
marks STAY inside tokens.  Devanagari vowel signs (matras) and the
virama are Mn, so the Latin split-on-non-letters would shred की into
क; Arabic harakat (usually absent from web text) ride along harmlessly.
The ZWNJ (Cf) still splits, which is exactly right for Persian —
می‌شود tokenizes as می + شود and the progressive prefix می is one of
the strongest Persian signals.

Everything compiles to the shared prefix-partitioned map fold in
``.stopwords`` (one JVM token pass, zero Python, zero shuffles), and
each family's DuckDB oracle is GENERATED from the same table, so the
driver hash certifies the scoring itself.
"""

from __future__ import annotations

from pyspark.sql import Column

from .stopwords import (
    FreqTable,
    family_langs,
    family_scores,
    oracle_langid_select,
    predicted_lang_family,
)

#: token split for mark-bearing scripts (see module docstring)
MARK_TOKEN_SPLIT_RE = r"[^\p{L}\p{M}]+"

#: Cyrillic: Russian / Ukrainian / Bulgarian / Serbian (Cyrillic
#: orthography).  Tie order = web-volume prior.  Discriminators: uk's
#: і/що/це/та/він are distinct codepoints or distinct words from ru's
#: и/что/это/и/он; bg drops case endings and uses да-clauses + the
#: copula е; sr (also да/се) separates on је/су/као/што/али.
CYRILLIC_FREQ: FreqTable = (
    (
        "ru",
        (
            ("и", 36), ("в", 32), ("не", 19), ("на", 18), ("я", 13),
            ("что", 12), ("с", 12), ("он", 11), ("как", 10), ("это", 9),
            ("а", 9), ("к", 8), ("но", 8), ("его", 7), ("по", 7),
            ("то", 6), ("она", 6), ("так", 6), ("же", 6), ("у", 6),
            ("из", 5), ("за", 5), ("от", 5), ("бы", 5), ("они", 4),
            ("мы", 4), ("вы", 4), ("для", 4), ("о", 4), ("было", 4),
            ("все", 4), ("был", 3), ("когда", 3), ("уже", 3),
            ("если", 3), ("есть", 3), ("чтобы", 3), ("еще", 3),
            ("или", 3), ("мне", 3), ("их", 3), ("меня", 3),
            ("только", 3), ("при", 2), ("них", 2), ("была", 2),
            ("были", 2), ("себя", 2), ("чем", 2), ("может", 2),
            ("кто", 2), ("этот", 2), ("того", 2), ("очень", 2),
            ("до", 2), ("вас", 2), ("нас", 2), ("ни", 2),
            ("после", 2), ("сегодня", 2), ("тоже", 1), ("здесь", 1),
        ),
    ),
    (
        "uk",
        (
            ("і", 30), ("в", 25), ("не", 20), ("на", 18), ("з", 14),
            ("що", 13), ("у", 10), ("до", 9), ("це", 8), ("як", 8),
            ("я", 8), ("та", 8), ("а", 7), ("за", 6), ("він", 6),
            ("по", 5), ("але", 5), ("про", 5), ("його", 4), ("від", 4),
            ("так", 4), ("для", 4), ("є", 4), ("же", 3), ("ми", 3),
            ("вона", 3), ("або", 3), ("коли", 3), ("був", 3),
            ("було", 3), ("ще", 3), ("вже", 3), ("щоб", 3),
            ("вони", 3), ("буде", 2), ("якщо", 2), ("із", 2),
            ("була", 2), ("ти", 2), ("нас", 2), ("при", 2),
            ("під", 2), ("між", 2), ("також", 2), ("тільки", 2),
            ("може", 2), ("дуже", 2), ("цього", 2), ("який", 2),
            ("яка", 2), ("які", 2), ("їх", 2), ("теж", 1),
        ),
    ),
    (
        "bg",
        (
            ("и", 40), ("на", 35), ("да", 25), ("в", 20), ("се", 18),
            ("не", 15), ("е", 14), ("за", 13), ("от", 11), ("че", 10),
            ("с", 9), ("то", 5), ("по", 5), ("но", 5), ("си", 5),
            ("това", 5), ("той", 4), ("ще", 4), ("като", 4), ("са", 4),
            ("има", 3), ("до", 3), ("ми", 3), ("го", 3), ("тя", 3),
            ("те", 3), ("му", 3), ("при", 2), ("или", 2), ("ако", 2),
            ("само", 2), ("още", 2), ("беше", 2), ("ни", 2), ("ме", 2),
            ("която", 2), ("който", 2), ("които", 2), ("защото", 2),
            ("много", 2), ("така", 2), ("вече", 2), ("може", 2),
            ("бъде", 2), ("й", 2), ("бе", 2), ("сме", 1), ("им", 1),
            ("тук", 1), ("там", 1), ("след", 2), ("през", 2),
        ),
    ),
    (
        "sr",
        (
            ("и", 35), ("је", 30), ("у", 28), ("да", 25), ("се", 20),
            ("на", 18), ("не", 15), ("за", 10), ("су", 9), ("од", 8),
            ("а", 8), ("са", 7), ("то", 6), ("као", 5), ("он", 4),
            ("по", 4), ("али", 4), ("би", 4), ("што", 4), ("из", 4),
            ("о", 3), ("или", 3), ("до", 3), ("ће", 3), ("га", 3),
            ("ми", 3), ("био", 3), ("који", 3), ("само", 3),
            ("смо", 2), ("била", 2), ("било", 2), ("ако", 2),
            ("када", 2), ("која", 2), ("које", 2), ("него", 2),
            ("јер", 2), ("још", 2), ("већ", 2), ("може", 2),
            ("она", 2), ("они", 2), ("све", 2), ("њих", 1),
            ("њу", 1), ("код", 1), ("без", 1), ("где", 1),
        ),
    ),
)

#: Arabic script: Arabic / Persian / Urdu.  Many top signals are
#: script-variant codepoints (fa/ur ی U+06CC vs ar ي U+064A; ur ہ
#: U+06C1, ے U+06D2; fa گ/چ/پ words) — distinct tokens by
#: construction.  Arabic's و conjunction writes ATTACHED (والكتاب) so
#: it is NOT a token; Persian's و is a standalone word and one of its
#: strongest signals.  می appears standalone because the ZWNJ splits.
ARABIC_FREQ: FreqTable = (
    (
        "ar",
        (
            ("في", 30), ("من", 28), ("على", 18), ("أن", 12),
            ("إلى", 10), ("ما", 8), ("لا", 8), ("عن", 7), ("التي", 6),
            ("هذا", 6), ("مع", 6), ("كان", 6), ("الذي", 5), ("هو", 5),
            ("أو", 5), ("قد", 4), ("كل", 4), ("إن", 4), ("ذلك", 4),
            ("هذه", 5), ("لم", 3), ("بعد", 3), ("بين", 3), ("كما", 3),
            ("هي", 3), ("أنه", 3), ("كانت", 3), ("الى", 3), ("ان", 3),
            ("غير", 2), ("حتى", 2), ("إذا", 2), ("ثم", 2), ("عند", 2),
            ("أي", 2), ("فيها", 2), ("منها", 2), ("عليه", 2),
            ("ليس", 2), ("هناك", 2), ("يكون", 2), ("التى", 1),
            ("الذى", 1), ("له", 2), ("لها", 2), ("نحن", 1), ("أنا", 2),
            ("أكثر", 1), ("حيث", 2), ("خلال", 2), ("عام", 1),
        ),
    ),
    (
        "fa",
        (
            ("و", 38), ("در", 25), ("به", 22), ("از", 20), ("که", 18),
            ("این", 12), ("را", 12), ("با", 10), ("است", 10),
            ("آن", 7), ("می", 6), ("برای", 6), ("یک", 5), ("خود", 4),
            ("تا", 4), ("او", 4), ("هم", 4), ("بود", 4), ("های", 4),
            ("بر", 3), ("ما", 3), ("نیز", 3), ("اما", 3), ("یا", 3),
            ("شد", 3), ("شده", 3), ("من", 3), ("کرد", 3), ("اگر", 2),
            ("هر", 2), ("چه", 2), ("دیگر", 2), ("شود", 2), ("باید", 2),
            ("آنها", 2), ("دارد", 2), ("همه", 2), ("نه", 2), ("پس", 1),
            ("بی", 1), ("وی", 1), ("کند", 2), ("شما", 2), ("ولی", 1),
            ("چون", 1), ("حتی", 1), ("هستند", 1), ("داد", 1),
            ("گفت", 2), ("سال", 1),
        ),
    ),
    (
        "ur",
        (
            ("کے", 35), ("میں", 25), ("کی", 25), ("ہے", 22), ("اور", 20),
            ("سے", 18), ("کا", 15), ("کو", 14), ("نے", 10), ("کہ", 10),
            ("پر", 8), ("یہ", 8), ("ہیں", 8), ("اس", 8), ("نہیں", 7),
            ("بھی", 6), ("وہ", 6), ("تو", 5), ("ایک", 5), ("کیا", 4),
            ("تھا", 4), ("ہو", 4), ("جو", 4), ("کر", 4), ("ان", 3),
            ("ہی", 3), ("لیے", 3), ("گیا", 3), ("آپ", 3), ("اپنے", 2),
            ("رہا", 2), ("رہے", 2), ("گے", 2), ("ہم", 2), ("لیکن", 2),
            ("دیا", 2), ("تھے", 2), ("تھی", 2), ("ساتھ", 2), ("بعد", 2),
            ("پھر", 2), ("مگر", 1), ("گی", 2), ("کرنے", 2), ("والے", 2),
            ("ہوں", 1), ("جب", 2), ("تک", 2), ("اب", 2), ("کچھ", 2),
        ),
    ),
)

#: Devanagari: Hindi / Marathi / Nepali.  The copulas alone separate
#: page-length text (hi है/हैं, mr आहे/आहेत, ne छ/छन्); mr's आणि and
#: ne's र conjunctions and the postposition systems differ too.
DEVANAGARI_FREQ: FreqTable = (
    (
        "hi",
        (
            ("के", 30), ("में", 25), ("की", 22), ("है", 22), ("और", 18),
            ("से", 15), ("का", 14), ("को", 14), ("पर", 8), ("कि", 8),
            ("हैं", 7), ("यह", 6), ("भी", 6), ("नहीं", 6), ("ने", 6),
            ("एक", 5), ("इस", 5), ("तो", 5), ("वह", 4), ("ही", 4),
            ("था", 4), ("कर", 4), ("जो", 4), ("लिए", 4), ("किया", 3),
            ("गया", 3), ("हो", 3), ("साथ", 2), ("रहा", 2), ("अपने", 2),
            ("हम", 2), ("आप", 2), ("लेकिन", 2), ("थी", 2), ("थे", 2),
            ("कुछ", 2), ("बाद", 2), ("करने", 2), ("वाले", 2),
            ("उनके", 2), ("इसके", 2), ("होता", 1), ("हुआ", 1),
            ("सकता", 1), ("तक", 2), ("जब", 2), ("या", 3), ("अब", 2),
        ),
    ),
    (
        "mr",
        (
            ("आहे", 20), ("आणि", 18), ("या", 8), ("ते", 7), ("व", 6),
            ("हे", 6), ("नाही", 6), ("तो", 5), ("ती", 5), ("की", 5),
            ("तर", 5), ("आहेत", 5), ("एक", 4), ("असे", 4), ("पण", 4),
            ("होते", 4), ("काय", 3), ("होता", 3), ("होती", 3),
            ("मी", 3), ("आता", 3), ("म्हणून", 3), ("झाले", 3),
            ("केले", 3), ("त्यांनी", 3), ("मध्ये", 3), ("म्हणजे", 2),
            ("झाला", 2), ("केला", 2), ("असून", 2), ("आम्ही", 2),
            ("तुम्ही", 2), ("त्याने", 2), ("येथे", 2), ("सर्व", 2),
            ("खूप", 2), ("कारण", 2), ("आला", 2), ("आली", 2),
            ("त्या", 2), ("हा", 3), ("ही", 3), ("करण्यात", 2),
            ("परंतु", 1), ("मात्र", 1), ("असलेल्या", 1), ("दोन", 1),
        ),
    ),
    (
        "ne",
        (
            ("र", 22), ("छ", 15), ("पनि", 8), ("छन्", 8), ("हो", 8),
            ("यो", 6), ("के", 4), ("तर", 4), ("भने", 4), ("गरेको", 3),
            ("भएको", 3), ("लागि", 3), ("गर्न", 3), ("हुने", 3),
            ("त्यो", 3), ("थियो", 3), ("छैन", 3), ("नै", 3), ("त", 3),
            ("पर्छ", 3), ("गर्ने", 3), ("अनि", 2), ("अब", 2),
            ("यस", 2), ("उनी", 2), ("उनले", 2), ("हामी", 2),
            ("हामीले", 2), ("धेरै", 2), ("भन्ने", 2), ("गरेका", 2),
            ("हुन्छ", 2), ("भयो", 2), ("एक", 2), ("भन्दा", 2),
            ("मलाई", 2), ("थाहा", 2), ("थिए", 2), ("गरी", 2),
            ("साथै", 1), ("तपाईं", 1), ("कुनै", 1), ("होइन", 1),
            ("दुई", 1), ("अहिले", 2), ("आफ्नो", 2), ("उनको", 1),
            ("हुन्", 2), ("भएर", 1), ("सबै", 2), ("अझै", 1),
            ("किनभने", 1), ("जुन", 1), ("यसको", 1),
        ),
    ),
)

#: Function-word/character markers for the UNSEGMENTED scripts the
#: space-split naturalness rule can never pass (Han, kana, Thai write
#: without spaces): the quality gate's unsegmented lane tests
#: CONTAINMENT of these instead of token membership.  Same committed
#: public-frequency-snapshot discipline as the tables above — these are
#: the highest-frequency grammatical particles of zh/ja/th/lo/my/km.
UNSEGMENTED_FUNCTION_MARKERS: tuple[str, ...] = (
    # zh: structural particle, aspect, copula, locative, conjunctions
    "的", "了", "是", "在", "有", "和", "不", "这", "這", "就", "而",
    # ja: case particles, topic, copula/polite endings
    "の", "に", "は", "を", "が", "で", "と", "も", "です", "ます",
    # th: relativizer, conjunction, prepositions, negation, modals
    "ที่", "และ", "ใน", "เป็น", "ของ", "การ", "ไม่", "ให้", "ได้", "มี",
    # lo: conjunction, genitive, locative, negation, existential
    "ແລະ", "ຂອງ", "ໃນ", "ບໍ່", "ມີ", "ທີ່", "ເປັນ",
    # my: conjunction/comma particle, sentence-final, plural, genitive
    "နှင့်", "သည်", "များ", "၏", "ကို", "တွင်",
    # km: conjunction, genitive, locative, copula, negation
    "និង", "របស់", "ក្នុង", "ជា", "មិន", "ដែល",
)

#: Korean IS space-delimited (so the token rule applies) but its
#: particles attach to words — the standalone closed-class items are
#: bound nouns, conjunctions and light verbs.  Unioned into
#: ``multilingual_stopwords`` so clean Korean prose passes the gate.
KOREAN_STOPWORDS: tuple[str, ...] = (
    "수", "있다", "있는", "없다", "것", "등", "및", "때", "또한",
    "그리고", "하지만", "그러나", "위해", "대한", "통해", "모든",
    "함께", "경우", "때문에", "다른", "가장", "매우", "지난", "이번",
    "대해", "같은", "많은", "그는", "그녀는", "우리는", "바로",
)

#: Chinese ORTHOGRAPHIC variant discriminators: characters whose
#: simplified and traditional forms are distinct codepoints, committed
#: as parallel snapshots (the same public-data discipline as the word
#: tables — these are among the most frequent simplified-vs-traditional
#: divergent characters).  A zh page's variant is the character-count
#: plurality; pages using only shared characters stay plain 'zh'.
SIMPLIFIED_ONLY = (
    "国学会这说对时们来发见样东车马门电长头买卖书写读语话为级红经给"
    "结几机难欢观现实听点么还过进远运动关开问间闻让认识记计证谁请谢"
    "爱乐体万与专业临义从众优价儿党军农减没"
)
TRADITIONAL_ONLY = (
    "國學會這說對時們來發見樣東車馬門電長頭買賣書寫讀語話為級紅經給"
    "結幾機難歡觀現實聽點麼還過進遠運動關開問間聞讓認識記計證誰請謝"
    "愛樂體萬與專業臨義從眾優價兒黨軍農減沒"
)
# 從/众... guard: the two snapshots must be parallel and disjoint
assert len(SIMPLIFIED_ONLY) == len(TRADITIONAL_ONLY)
assert not set(SIMPLIFIED_ONLY) & set(TRADITIONAL_ONLY)


def han_variant(text_col: str = "text") -> Column:
    """'zh-hans' / 'zh-hant' / 'zh' by distinctive-character plurality —
    the intra-Han refinement (simplified and traditional Chinese are
    different token distributions for every per-language corpus stage).
    Two JVM regexp passes; ties and pages of purely shared characters
    stay the unrefined 'zh'."""
    from pyspark.sql import functions as F

    simp = F.length(
        F.regexp_replace(F.col(text_col), f"[^{SIMPLIFIED_ONLY}]", "")
    )
    trad = F.length(
        F.regexp_replace(F.col(text_col), f"[^{TRADITIONAL_ONLY}]", "")
    )
    return (
        F.when(simp > trad, F.lit("zh-hans"))
        .when(trad > simp, F.lit("zh-hant"))
        .otherwise(F.lit("zh"))
    )


#: script key (as predicted_lang_script emits it) -> (table, default)
FAMILIES: dict[str, tuple[FreqTable, str]] = {
    "ru": (CYRILLIC_FREQ, "ru"),
    "ar": (ARABIC_FREQ, "ar"),
    "hi": (DEVANAGARI_FREQ, "hi"),
}

CYRILLIC_LANGS = family_langs(CYRILLIC_FREQ)
ARABIC_LANGS = family_langs(ARABIC_FREQ)
DEVANAGARI_LANGS = family_langs(DEVANAGARI_FREQ)


def predicted_lang_cyrillic(
    text_col: str = "text",
    default: str = "ru",
    und_floor: float | None = None,
) -> Column:
    """Cyrillic intra-script language ID (ru/uk/bg/sr) — argmax over
    :data:`CYRILLIC_FREQ`; zero-hit text falls back to ``default``
    (Russian is the script's web prior)."""
    return predicted_lang_family(
        CYRILLIC_FREQ,
        text_col,
        default=default,
        und_floor=und_floor,
        token_re=MARK_TOKEN_SPLIT_RE,
    )


def predicted_lang_arabic_script(
    text_col: str = "text",
    default: str = "ar",
    und_floor: float | None = None,
) -> Column:
    """Arabic-script intra-script language ID (ar/fa/ur)."""
    return predicted_lang_family(
        ARABIC_FREQ,
        text_col,
        default=default,
        und_floor=und_floor,
        token_re=MARK_TOKEN_SPLIT_RE,
    )


def predicted_lang_devanagari(
    text_col: str = "text",
    default: str = "hi",
    und_floor: float | None = None,
) -> Column:
    """Devanagari intra-script language ID (hi/mr/ne).  The tokenizer
    keeps combining marks (matras, virama) inside tokens — see the
    module docstring."""
    return predicted_lang_family(
        DEVANAGARI_FREQ,
        text_col,
        default=default,
        und_floor=und_floor,
        token_re=MARK_TOKEN_SPLIT_RE,
    )


def family_oracle_select(
    freq: FreqTable,
    doc_sql: str,
    default: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang",
    und_floor: float | None = None,
    score_col: str | None = None,
) -> str:
    """DuckDB SELECT replicating a family classifier — generated from
    the same table + the mark-keeping tokenizer, so a driver hash match
    certifies scoring, floor and tie order together."""
    return oracle_langid_select(
        doc_sql,
        id_col=id_col,
        text_col=text_col,
        out_col=out_col,
        default=default,
        und_floor=und_floor,
        score_col=score_col,
        freq=freq,
        token_re=MARK_TOKEN_SPLIT_RE,
    )


def family_score_vector(freq: FreqTable, text_col: str = "text") -> Column:
    """Auditable per-language score vector for a non-Latin family."""
    return family_scores(freq, text_col, token_re=MARK_TOKEN_SPLIT_RE)

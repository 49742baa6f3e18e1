"""Non-Latin intra-script language ID (functions/script_families.py):
real sentences in ru/uk/bg/sr, ar/fa/ur and hi/mr/ne classify correctly
from the committed function-word tables, the coverage floor labels
untabled same-script languages und, the mark-keeping tokenizer holds
abugida tokens together, the DuckDB oracle generated from the same
tables agrees exactly, and predicted_lang_script routes each script
through its family.  Also pins the round-11 prefix-partitioned vocab
map == flat map equality (the exact-by-construction fold optimization).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
    ARABIC_FREQ,
    CYRILLIC_FREQ,
    DEVANAGARI_FREQ,
    MARK_TOKEN_SPLIT_RE,
    family_oracle_select,
    predicted_lang_arabic_script,
    predicted_lang_cyrillic,
    predicted_lang_devanagari,
)

# (expected lang, page-register text) per family — news/wiki sentences
# at natural page length; single short sentences with unlucky shared
# particles can flip between related languages in ANY stopword
# classifier, so fixtures stay sentence-length and up.
CYR_MATRIX = [
    ("ru", "ученые обнаружили что океан нагревается быстрее чем они "
           "думали и это будет проблемой для всех стран в ближайшие годы"),
    ("ru", "я не знаю что с этим делать но мы должны найти решение как "
           "можно скорее потому что времени у нас мало"),
    ("uk", "вчені виявили що океан нагрівається швидше ніж вони думали "
           "і це буде проблемою для всіх країн у найближчі роки"),
    ("uk", "я не знаю що з цим робити але ми маємо знайти рішення "
           "якнайшвидше бо часу в нас обмаль"),
    ("bg", "учените откриха че океанът се затопля по-бързо отколкото са "
           "смятали и това ще бъде проблем за всички страни"),
    ("bg", "не знам какво да правя с това но трябва да намерим решение "
           "възможно най-бързо защото нямаме много време"),
    ("sr", "научници су открили да се океан загрева брже него што су "
           "мислили и то ће бити проблем за све земље у наредним годинама"),
    ("sr", "не знам шта да радим са овим али морамо да нађемо решење "
           "што пре јер немамо много времена"),
]

ARB_MATRIX = [
    ("ar", "اكتشف العلماء أن المحيط يسخن بشكل أسرع مما كانوا يعتقدون من "
           "قبل وقالوا إن هذا سيكون مشكلة في كل البلدان على مستوى العالم"),
    ("ar", "لا أعرف ما الذي يجب أن نفعله في هذه الحالة ولكن يجب أن نجد "
           "حلا في أقرب وقت لأن الوقت ليس في صالحنا"),
    ("fa", "دانشمندان دریافتند که اقیانوس سریعتر از آنچه فکر می‌کردند در "
           "حال گرم شدن است و این برای همه کشورها مشکل خواهد بود"),
    ("fa", "نمی‌دانم با این چه باید کرد اما ما باید هر چه زودتر راه حلی "
           "پیدا کنیم چون وقت زیادی نداریم و این مهم است"),
    ("ur", "سائنسدانوں نے دریافت کیا ہے کہ سمندر ان کی سوچ سے زیادہ "
           "تیزی سے گرم ہو رہا ہے اور یہ سب کے لیے ایک مسئلہ ہو گا"),
    ("ur", "مجھے نہیں معلوم کہ اس کا کیا کیا جائے لیکن ہمیں جلد سے جلد "
           "کوئی حل تلاش کرنا ہو گا کیونکہ ہمارے پاس وقت کم ہے"),
]

DEV_MATRIX = [
    ("hi", "वैज्ञानिकों ने पाया है कि महासागर उनकी सोच से अधिक तेजी से "
           "गर्म हो रहा है और यह सभी देशों के लिए एक समस्या होगी"),
    ("hi", "मुझे नहीं पता कि इसके साथ क्या करना है लेकिन हमें जल्द से "
           "जल्द एक समाधान खोजना होगा क्योंकि हमारे पास समय कम है"),
    ("mr", "शास्त्रज्ञांना असे आढळले आहे की महासागर त्यांच्या "
           "अपेक्षेपेक्षा वेगाने गरम होत आहे आणि ही सर्व देशांसाठी एक "
           "समस्या आहे"),
    ("mr", "याचे काय करायचे हे मला माहीत नाही पण आपल्याला लवकरात लवकर "
           "एक उपाय शोधावा लागेल कारण आपल्याकडे वेळ कमी आहे"),
    ("ne", "वैज्ञानिकहरूले पत्ता लगाएका छन् कि समुद्र उनीहरूले सोचेको "
           "भन्दा छिटो तातो हुँदैछ र यो सबै देशहरूका लागि समस्या हुनेछ"),
    ("ne", "यसको के गर्ने भन्ने मलाई थाहा छैन तर हामीले सकेसम्म चाँडो "
           "समाधान खोज्नु पर्छ किनभने हामीसँग समय धेरै छैन"),
]

#: untabled same-script languages — what the coverage floor exists for
KK = ("барлық адамдар тумысынан азат және қадір-қасиеті мен құқықтары "
      "тең болып дүниеге келеді оларға ақыл-парасат берілген")
PS = ("ټول انسانان آزاد نړۍ ته راځي او د عزت او حقونو له پلوه سره "
      "برابر دي دوی ته عقل او وجدان ورکړل شوی دی")
SA = ("धर्मक्षेत्रे कुरुक्षेत्रे समवेता युयुत्सवः मामकाः पाण्डवाश्चैव "
      "किमकुर्वत सञ्जय उवाच दृष्ट्वा तु पाण्डवानीकं व्यूढं")

FAMILY_CASES = [
    ("cyr", CYR_MATRIX, KK, predicted_lang_cyrillic, CYRILLIC_FREQ, "ru"),
    ("arb", ARB_MATRIX, PS, predicted_lang_arabic_script, ARABIC_FREQ, "ar"),
    ("dev", DEV_MATRIX, SA, predicted_lang_devanagari, DEVANAGARI_FREQ, "hi"),
]


def _classify(spark, texts, predict, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        r["lang"]
        for r in df.select("doc_id", predict("text", **kw).alias("lang"))
        .orderBy("doc_id")
        .collect()
    ]


@pytest.mark.parametrize(
    "name,matrix,predict",
    [(n, m, p) for n, m, _u, p, _f, _d in FAMILY_CASES],
    ids=[c[0] for c in FAMILY_CASES],
)
def test_family_sentences_classify_correctly(spark, name, matrix, predict):
    got = _classify(spark, [t for _, t in matrix], predict)
    assert got == [lang for lang, _ in matrix]


@pytest.mark.parametrize(
    "name,untabled,predict,default",
    [(n, u, p, d) for n, _m, u, p, _f, d in FAMILY_CASES],
    ids=[c[0] for c in FAMILY_CASES],
)
def test_untabled_language_floors_to_und(spark, name, untabled, predict, default):
    """An untabled language of the same script labels und under the
    coverage floor; without the floor it keeps the script's web prior
    (or a nearest-tabled guess) — never crashes."""
    [with_floor] = _classify(spark, [untabled], predict, und_floor=0.25)
    assert with_floor == "und"
    [without] = _classify(spark, [untabled], predict)
    assert without != "und"  # floor off: confident fallback semantics


@pytest.mark.parametrize(
    "name,predict,default",
    [(n, p, d) for n, _m, _u, p, _f, d in FAMILY_CASES],
    ids=[c[0] for c in FAMILY_CASES],
)
def test_zero_hit_and_empty_defaults(spark, name, predict, default):
    """Zero-hit non-empty text is und under the floor; tokenless text
    falls to the family default even with the floor on (same contract
    as the Latin classifier)."""
    salad = {"cyr": "жфыкп щцврб длмтн", "arb": "قشغف خضمث طلبج",
             "dev": "खगझट ठडढण थधफभ"}[name]
    got = _classify(spark, [salad, "", "   12345  "], predict, und_floor=0.25)
    assert got == ["und", default, default]


def test_devanagari_tokenizer_keeps_marks(spark):
    """The mark-keeping split is what holds matra/virama words whole:
    the Latin split-on-non-letters would shred की into क and ne छन्
    into छ+न, collapsing the strongest family signals."""
    df = spark.createDataFrame([(1,)], "doc_id long").select(
        F.expr(
            "split(lower('की है छन् و می‌شود'), "
            "'[^\\\\p{L}\\\\p{M}]+')"
        ).alias("toks")
    )
    [row] = df.collect()
    assert row["toks"] == ["की", "है", "छन्", "و", "می", "شود"]


@pytest.mark.parametrize(
    "name,matrix,untabled,predict,freq,default",
    FAMILY_CASES,
    ids=[c[0] for c in FAMILY_CASES],
)
def test_oracle_agrees_exactly(
    spark, name, matrix, untabled, predict, freq, default
):
    """The DuckDB oracle generated from the same table + tokenizer
    classifies every fixture identically (floor on, scores included)."""
    texts = [t for _, t in matrix] + [untabled, ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["lang"],)
        for r in df.select(
            "doc_id", predict("text", und_floor=0.25).alias("lang")
        ).collect()
    }
    values = ", ".join(
        "({i}, '{t}')".format(i=i, t=t.replace("'", "''"))
        for i, t in enumerate(texts)
    )
    sql = family_oracle_select(
        freq,
        f"SELECT * FROM (VALUES {values}) AS v(doc_id, text)",
        default=default,
        und_floor=0.25,
    )
    want = {r[0]: (r[1],) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == want


def test_script_routing_refines_within_script(spark):
    """predicted_lang_script routes a Cyrillic winner through ru/uk/bg/
    sr, Arabic script through ar/fa/ur, Devanagari through hi/mr/ne;
    intra_script=False keeps the pre-round-11 script labels; the
    single-language scripts are untouched either way."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        predicted_lang_script,
    )

    texts = [
        CYR_MATRIX[2][1],   # uk
        ARB_MATRIX[4][1],   # ur
        DEV_MATRIX[2][1],   # mr
        "こんにちは世界です元気ですか",       # ja unchanged
        "안녕하세요 세계 여러분 반갑습니다",  # ko unchanged
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    routed = [
        r["l"]
        for r in df.select(predicted_lang_script("text").alias("l"))
        .orderBy("doc_id").collect()
    ]
    assert routed == ["uk", "ur", "mr", "ja", "ko"]
    legacy = [
        r["l"]
        for r in df.select(
            predicted_lang_script("text", intra_script=False).alias("l")
        ).orderBy("doc_id").collect()
    ]
    assert legacy == ["ru", "ar", "hi", "ja", "ko"]


def test_prefix_partitioned_fold_equals_flat(spark):
    """Round-11 fold optimization: the prefix-partitioned two-level
    vocab map must classify EXACTLY like the naive flat map — equal by
    construction (same words, same vectors, miss = NULL at either
    level), pinned here over the Latin fixture matrix, the family
    matrices and adversarial salads."""
    from polygon_io_data_ingestion_pipeline_spark.functions.stopwords import (
        predicted_lang_latin,
    )
    from tests.test_latin_langid import MATRIX as LATIN_MATRIX

    texts = (
        [t for _, t in LATIN_MATRIX]
        + [t for _, t in CYR_MATRIX]  # non-Latin through the Latin path
        + ["", "   ", "a a a a", "zzz qqq", "de de de que que la le il"]
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        predicted_lang_latin("text", und_floor=0.25, flat=False).alias("p"),
        predicted_lang_latin("text", und_floor=0.25, flat=True).alias("f"),
    ).collect()
    assert all(r["p"] == r["f"] for r in out)


def test_prefix_fold_equals_flat_hypothesis(spark):
    """Property form of the equality over random token soups drawn
    from table words, table-word prefixes and arbitrary letters."""
    import random

    from polygon_io_data_ingestion_pipeline_spark.functions.stopwords import (
        STOPWORD_FREQ,
        predicted_lang_latin,
    )

    rng = random.Random(11)
    words = [w for _, ws in STOPWORD_FREQ for w, _ in ws]
    pool = words + [w[:2] for w in words] + ["xq", "zz", "foo", "ßę"]
    texts = [
        " ".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        predicted_lang_latin("text", und_floor=0.25, flat=False).alias("p"),
        predicted_lang_latin("text", und_floor=0.25, flat=True).alias("f"),
    ).collect()
    assert all(r["p"] == r["f"] for r in out)


def test_script_routing_honors_script_und_floor(spark):
    """predicted_lang_script(script_und_floor=): an untabled language
    of a multi-language script (Kazakh — Cyrillic wins the script
    vote) labels und under the floor instead of a confident
    nearest-tabled guess; genuine tabled pages keep their labels
    (round-11 review finding — production ingests that floor the Latin
    lane must be able to floor the refined scripts too)."""
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        predicted_lang_script,
    )

    texts = [KK, CYR_MATRIX[2][1], ARB_MATRIX[2][1]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        r["l"]
        for r in df.select(
            predicted_lang_script(
                "text", latin_und_floor=0.15, script_und_floor=0.25
            ).alias("l")
        ).orderBy("doc_id").collect()
    ]
    assert got == ["und", "uk", "fa"]


def test_han_variant_refinement(spark):
    """zh-hans / zh-hant by distinctive-character plurality; pages of
    purely shared characters stay 'zh'; opt-in through
    predicted_lang_script(han_variants=True) — kana still forces ja."""
    from polygon_io_data_ingestion_pipeline_spark.functions.script_families import (
        han_variant,
    )
    from polygon_io_data_ingestion_pipeline_spark.operators.text import (
        predicted_lang_script,
    )

    simp = ("学习中文的时候我们会发现很多有趣的东西这让学习变得更加有意思"
            "而且还能认识很多新朋友")
    trad = ("學習中文的時候我們會發現很多有趣的東西這讓學習變得更加有意思"
            "而且還能認識很多新朋友")
    shared = "中文文化有千年天地人日月山水春夏秋冬"
    ja = "こんにちは世界です元気ですか学校に行きます"
    df = spark.createDataFrame(
        [(0, simp), (1, trad), (2, shared), (3, ja)],
        "doc_id long, text string",
    )
    got = [
        r["l"] for r in df.select(han_variant("text").alias("l"))
        .orderBy("doc_id").collect()
    ]
    assert got[:3] == ["zh-hans", "zh-hant", "zh"]
    routed = [
        r["l"] for r in df.select(
            predicted_lang_script("text", han_variants=True).alias("l")
        ).orderBy("doc_id").collect()
    ]
    assert routed == ["zh-hans", "zh-hant", "zh", "ja"]
    # default keeps the unrefined label every existing oracle pins
    plain = [
        r["l"] for r in df.select(
            predicted_lang_script("text").alias("l")
        ).orderBy("doc_id").collect()
    ]
    assert plain == ["zh", "zh", "zh", "ja"]

"""Latin-script language ID over committed function-word frequency tables.

Unicode-script counting (``operators/text.py:predicted_lang_script``)
separates ru/ja/zh/ko/ar/hi/el/he/th for free, but every Latin-script
language lands in the same bucket — and a real crawl is mostly Latin
script.  The standard lightweight discriminator is FUNCTION-WORD
frequency: the closed class of articles/prepositions/conjunctions is
(a) language-specific, (b) extremely frequent (the top ~40 function
words cover 30-40% of running text in every European language), and
(c) topic-independent — so a weighted bag-of-function-words argmax
classifies clean body text reliably without any model file.

``STOPWORD_FREQ`` below is a committed snapshot of per-language
function-word weights — approximate occurrences per 1000 running words
from public word-frequency lists (Leipzig Corpora / OpenSubtitles
class of data; values rounded to integers).  Same discipline as the
PSL snapshot in :mod:`.psl`: public data committed to the repo and
compiled to a pure Spark expression.  Shared words (``de`` in
es/fr/pt/nl, ``que`` in es/fr/pt, ``la`` in es/fr/it ...) carry their
per-language weights in several columns of the weight vector, so the
DISTINCTIVE words decide while the shared mass cancels.

Scale shape: ONE pass over the token array — tokens lower-case and
split on non-letters, each token map-looks-up its weight VECTOR (one
column per language), misses filter out, hits fold with ``zip_with``
into a per-document score vector; argmax with a fixed tie order picks
the language.  All JVM expressions (map/array literals are constant,
the fold is a single ``aggregate``), zero Python, zero shuffles, and
the whole classifier is replicable in ANSI SQL from the same tables
(the DuckDB oracle is GENERATED from ``STOPWORD_FREQ``, so both
engines score with literally the same weights).

Extending coverage = adding a table row (the PSL swap-in move); a
Latin-script language absent from the tables classifies as its nearest
tabled neighbour — commit its function words to fix that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (language, ((function word, ~occurrences per 1000 words), ...)).
#: Tuple order is the deterministic argmax tie order.  The fr/it
#: single-letter entries are ELISION fragments (l', d', qu', c' ...) —
#: the non-letter split turns them into standalone tokens, and they are
#: among the strongest French/Italian signals in real text.
STOPWORD_FREQ: tuple[tuple[str, tuple[tuple[str, int], ...]], ...] = (
    (
        "en",
        (
            ("the", 60), ("of", 30), ("and", 28), ("to", 26), ("a", 23),
            ("in", 21), ("is", 11), ("that", 11), ("it", 10), ("for", 9),
            ("was", 9), ("on", 7), ("are", 7), ("with", 7), ("as", 7),
            ("his", 6), ("they", 6), ("be", 6), ("at", 6), ("you", 6),
            ("have", 5), ("this", 5), ("from", 5), ("or", 4), ("had", 4),
            ("by", 4), ("not", 4), ("but", 4), ("we", 4), ("what", 3),
            ("which", 3), ("their", 3), ("will", 3), ("would", 3),
            ("there", 3), ("has", 3), ("were", 3), ("her", 3),
            ("she", 3), ("an", 3), ("been", 2), ("if", 2), ("when", 2),
            ("all", 2), ("one", 2), ("more", 2), ("about", 2), ("so", 2),
            ("out", 2), ("up", 2), ("him", 2), ("them", 2), ("some", 2),
            ("into", 2), ("can", 2), ("do", 2), ("than", 2), ("then", 2),
            ("its", 2), ("these", 2), ("other", 2),
        ),
    ),
    (
        "es",
        (
            ("de", 65), ("la", 42), ("el", 30), ("en", 27), ("y", 27),
            ("a", 26), ("que", 25), ("los", 19), ("se", 12), ("del", 10),
            ("las", 10), ("un", 10), ("por", 10), ("con", 9), ("una", 9),
            ("no", 9), ("su", 8), ("para", 8), ("es", 7), ("al", 7),
            ("lo", 6), ("como", 6), ("más", 5), ("ha", 4), ("pero", 4),
            ("sus", 4), ("le", 4), ("fue", 3), ("son", 3), ("me", 3),
            ("ya", 3), ("o", 3), ("este", 3), ("esta", 3), ("si", 3),
            ("te", 3), ("han", 2), ("ser", 2), ("está", 2),
            ("cuando", 2), ("muy", 2), ("sin", 2), ("sobre", 2),
            ("también", 2), ("entre", 2), ("hay", 2), ("porque", 2),
            ("sí", 2), ("donde", 2), ("todo", 2), ("todos", 2),
            ("qué", 2), ("mi", 2), ("nos", 2), ("él", 2), ("desde", 1),
            ("hasta", 1), ("están", 1), ("otros", 1), ("ese", 1),
            ("esa", 1), ("eso", 1),
        ),
    ),
    (
        "fr",
        (
            ("de", 55), ("à", 28), ("la", 28), ("le", 26), ("et", 25),
            ("les", 21), ("des", 17), ("en", 16), ("un", 15), ("l", 15),
            ("d", 15), ("du", 14), ("une", 13), ("que", 12), ("est", 11),
            ("pour", 10), ("qui", 9), ("dans", 9), ("a", 8), ("il", 7),
            ("par", 7), ("plus", 5), ("pas", 5), ("au", 5), ("sur", 5),
            ("ne", 5), ("se", 5), ("ce", 5), ("je", 5), ("c", 5),
            ("qu", 5), ("sont", 4), ("avec", 4), ("son", 4), ("ont", 4),
            ("n", 4), ("s", 4), ("aux", 3), ("cette", 3), ("ou", 3),
            ("mais", 3), ("comme", 3), ("nous", 3), ("vous", 3),
            ("on", 3), ("elle", 3), ("été", 3), ("était", 3), ("sa", 3),
            ("ils", 3), ("j", 3), ("leur", 2), ("ses", 2), ("tout", 2),
            ("être", 2), ("même", 2), ("aussi", 2), ("bien", 2),
            ("sans", 2), ("peut", 2), ("très", 2), ("tous", 2),
            ("où", 2), ("dont", 2), ("ça", 2), ("lui", 2), ("y", 2),
            ("si", 2), ("fait", 1), ("deux", 1), ("alors", 1),
            ("après", 1), ("donc", 1), ("ainsi", 1), ("notre", 1),
            ("votre", 1), ("cela", 1),
        ),
    ),
    (
        "de",
        (
            ("der", 58), ("die", 55), ("und", 44), ("in", 31),
            ("den", 19), ("von", 17), ("zu", 17), ("das", 17),
            ("mit", 14), ("sich", 11), ("des", 10), ("auf", 10),
            ("für", 10), ("ist", 9), ("im", 9), ("dem", 9), ("nicht", 9),
            ("ein", 8), ("eine", 7), ("als", 7), ("sie", 7), ("auch", 6),
            ("es", 6), ("an", 6), ("ich", 6), ("werden", 5), ("aus", 5),
            ("er", 5), ("hat", 4), ("dass", 4), ("nach", 4), ("wird", 4),
            ("bei", 4), ("einer", 4), ("um", 4), ("war", 4), ("wenn", 4),
            ("aber", 4), ("oder", 4), ("nur", 4), ("wir", 4), ("so", 4),
            ("am", 3), ("sind", 3), ("noch", 3), ("wie", 3),
            ("einem", 3), ("über", 3), ("einen", 3), ("zum", 3),
            ("haben", 3), ("wurde", 3), ("durch", 3), ("vor", 3),
            ("mehr", 3), ("diese", 3), ("sein", 3), ("man", 3),
            ("kann", 3), ("zur", 2), ("unter", 2), ("schon", 2),
            ("dieser", 2), ("seine", 2), ("ihre", 2), ("doch", 2),
            ("du", 2), ("dann", 2), ("ihr", 2),
        ),
    ),
    (
        "it",
        (
            ("di", 45), ("e", 40), ("il", 32), ("la", 29), ("che", 29),
            ("in", 19), ("a", 19), ("per", 15), ("un", 13), ("è", 13),
            ("del", 12), ("non", 12), ("della", 10), ("si", 9),
            ("con", 8), ("le", 8), ("l", 8), ("da", 7), ("i", 7),
            ("una", 7), ("al", 6), ("lo", 5), ("ma", 5), ("come", 4),
            ("nel", 4), ("se", 4), ("anche", 4), ("più", 4), ("sono", 4),
            ("dei", 4), ("alla", 4), ("ci", 4), ("d", 4), ("delle", 3),
            ("gli", 3), ("o", 3), ("questo", 3), ("ha", 3), ("ed", 3),
            ("ne", 3), ("dell", 3), ("c", 3), ("quando", 2), ("loro", 2),
            ("essere", 2), ("questa", 2), ("tutti", 2), ("tutto", 2),
            ("così", 2), ("molto", 2), ("senza", 2), ("tra", 2),
            ("nella", 2), ("degli", 2), ("dal", 2), ("stato", 2),
            ("hanno", 2), ("ad", 2), ("all", 2), ("nell", 2),
            ("perché", 2), ("sulla", 1), ("sul", 1), ("questi", 1),
            ("dove", 1), ("dopo", 1), ("due", 1), ("fra", 1),
            ("ogni", 1), ("dalla", 1), ("può", 1), ("quindi", 1),
        ),
    ),
    (
        "pt",
        (
            ("de", 58), ("a", 35), ("o", 33), ("que", 30), ("e", 29),
            ("do", 18), ("da", 17), ("em", 13), ("um", 12), ("para", 11),
            ("é", 10), ("com", 10), ("não", 10), ("uma", 9), ("os", 9),
            ("no", 8), ("se", 8), ("na", 8), ("por", 7), ("mais", 5),
            ("as", 5), ("dos", 5), ("como", 4), ("mas", 4), ("foi", 3),
            ("ao", 3), ("ele", 3), ("das", 3), ("tem", 3), ("à", 3),
            ("seu", 3), ("sua", 3), ("ou", 3), ("eu", 3), ("são", 3),
            ("você", 3), ("ser", 2), ("quando", 2), ("muito", 2),
            ("há", 2), ("nos", 2), ("já", 2), ("está", 2),
            ("também", 2), ("pelo", 2), ("pela", 2), ("até", 2),
            ("sem", 2), ("sobre", 2), ("isso", 2), ("esse", 2),
            ("esta", 2), ("ela", 2), ("eles", 2), ("ainda", 2),
            ("aqui", 2), ("bem", 2), ("seus", 2), ("ter", 2), ("às", 2),
            ("aos", 2), ("neste", 1), ("nesta", 1), ("isto", 1),
            ("essa", 1), ("depois", 1), ("cada", 1), ("num", 1),
            ("numa", 1), ("suas", 1), ("têm", 1), ("entre", 1),
        ),
    ),
    (
        "nl",
        (
            ("de", 58), ("van", 27), ("een", 23), ("het", 22), ("en", 22),
            ("in", 17), ("is", 11), ("dat", 11), ("op", 10), ("te", 10),
            ("zijn", 7), ("met", 7), ("die", 7), ("voor", 7),
            ("niet", 7), ("aan", 6), ("er", 6), ("ik", 6), ("om", 5),
            ("je", 5), ("ook", 4), ("als", 4), ("dan", 4), ("maar", 4),
            ("bij", 4), ("of", 4), ("was", 4), ("ze", 4), ("we", 4),
            ("uit", 3), ("nog", 3), ("worden", 3), ("door", 3),
            ("naar", 3), ("heeft", 3), ("wordt", 3), ("hij", 3),
            ("wat", 3), ("deze", 3), ("hebben", 3), ("over", 3),
            ("dit", 2), ("zo", 2), ("kan", 2), ("geen", 2), ("wel", 2),
            ("al", 2), ("hun", 2), ("waar", 2), ("daar", 2), ("hier", 2),
            ("moet", 2), ("kunnen", 2), ("zou", 2), ("werd", 2),
            ("mijn", 2), ("zich", 2), ("haar", 2), ("heb", 2),
            ("tot", 2), ("toen", 2), ("veel", 2), ("meer", 2),
            ("onze", 1), ("tegen", 1), ("tussen", 1), ("alle", 1),
            ("hem", 1),
        ),
    ),
    # round-10 coverage extension: the remaining high-volume
    # Latin-script crawl languages.  Same public word-frequency-list
    # provenance and per-1000 rounding as the rows above; closely
    # related pairs (da/no, pl/cs) deliberately carry their mutual
    # DISCRIMINATORS (af/av, efter/etter, hvad/hva, w/v, się/se ...)
    # so page-length text separates.
    (
        "pl",
        (
            ("w", 32), ("i", 30), ("się", 28), ("nie", 25), ("na", 22),
            ("z", 20), ("do", 16), ("to", 15), ("że", 15), ("a", 13),
            ("o", 10), ("jak", 9), ("jest", 9), ("po", 7), ("co", 7),
            ("ale", 6), ("czy", 5), ("przez", 5), ("od", 5), ("za", 5),
            ("dla", 5), ("tak", 5), ("już", 4), ("tym", 4), ("tylko", 4),
            ("był", 4), ("przy", 3), ("może", 3), ("być", 3), ("są", 3),
            ("który", 3), ("która", 3), ("które", 3), ("ich", 3),
            ("było", 3), ("była", 3), ("jego", 3), ("bardzo", 3),
            ("przed", 2), ("kiedy", 2), ("jeszcze", 2), ("nad", 2),
            ("bez", 2), ("więc", 2), ("gdy", 2), ("też", 2),
            ("można", 2), ("ma", 2), ("mnie", 2), ("go", 2), ("im", 2),
            ("nas", 2), ("pod", 2), ("ten", 2), ("ta", 2), ("oraz", 2),
            ("również", 2), ("aby", 2), ("będzie", 2), ("tego", 2),
        ),
    ),
    (
        "sv",
        (
            ("och", 35), ("i", 30), ("att", 28), ("det", 25),
            ("som", 22), ("en", 20), ("på", 18), ("är", 17), ("av", 15),
            ("för", 14), ("med", 13), ("till", 12), ("den", 11),
            ("har", 9), ("de", 9), ("inte", 9), ("om", 8), ("ett", 8),
            ("men", 7), ("var", 6), ("jag", 6), ("sig", 5), ("från", 5),
            ("vi", 5), ("så", 5), ("kan", 5), ("man", 4), ("när", 4),
            ("han", 4), ("efter", 3), ("eller", 3), ("hade", 3),
            ("vid", 3), ("skulle", 3), ("hon", 3), ("alla", 3),
            ("då", 3), ("sin", 3), ("nu", 3), ("ska", 3), ("år", 3),
            ("under", 2), ("även", 2), ("kommer", 2), ("ut", 2),
            ("över", 2), ("där", 2), ("denna", 2), ("detta", 2),
            ("sedan", 2), ("mycket", 2), ("bli", 2), ("blir", 2),
            ("finns", 2), ("vad", 2), ("bara", 2), ("mot", 2),
            ("också", 2), ("någon", 2), ("andra", 2),
        ),
    ),
    (
        "da",
        (
            ("og", 34), ("i", 30), ("at", 28), ("det", 24), ("er", 22),
            ("en", 19), ("til", 16), ("af", 16), ("på", 14), ("som", 13),
            ("de", 12), ("den", 11), ("der", 11), ("har", 10),
            ("med", 10), ("for", 10), ("ikke", 9), ("et", 8),
            ("men", 7), ("jeg", 6), ("var", 6), ("om", 6), ("han", 5),
            ("vi", 5), ("så", 5), ("kan", 5), ("man", 4), ("fra", 4),
            ("du", 4), ("sig", 4), ("hvor", 3), ("eller", 3),
            ("hvad", 3), ("skal", 3), ("ved", 3), ("efter", 3),
            ("vil", 3), ("nu", 3), ("da", 3), ("også", 3), ("være", 3),
            ("havde", 3), ("blev", 2), ("over", 2), ("når", 2),
            ("under", 2), ("dette", 2), ("denne", 2), ("noget", 2),
            ("alle", 2), ("sin", 2), ("kun", 2), ("meget", 2),
            ("op", 2), ("ud", 2), ("bliver", 2), ("hun", 2),
            ("hans", 2), ("dig", 1), ("os", 1),
        ),
    ),
    (
        "no",
        (
            ("og", 34), ("i", 29), ("det", 24), ("er", 22), ("som", 18),
            ("en", 17), ("å", 17), ("til", 15), ("på", 15), ("av", 14),
            ("at", 16), ("for", 12), ("de", 11), ("med", 11),
            ("den", 10), ("har", 10), ("ikke", 9), ("et", 8),
            ("men", 7), ("om", 6), ("var", 6), ("jeg", 6), ("så", 5),
            ("seg", 5), ("kan", 5), ("vi", 5), ("fra", 4), ("han", 4),
            ("skal", 4), ("du", 4), ("vil", 3), ("eller", 3),
            ("da", 3), ("etter", 3), ("ved", 3), ("når", 3),
            ("også", 3), ("ble", 3), ("blir", 3), ("være", 3),
            ("hadde", 3), ("dette", 3), ("noe", 3), ("hva", 2),
            ("hvor", 2), ("denne", 2), ("alle", 2), ("sin", 2),
            ("bare", 2), ("mot", 2), ("under", 2), ("nå", 2),
            ("mer", 2), ("enn", 2), ("vet", 2), ("andre", 2),
            ("opp", 2), ("ut", 2), ("år", 2), ("hun", 2), ("hans", 2),
            ("man", 2), ("ennå", 1), ("dere", 1), ("oss", 1),
        ),
    ),
    (
        "tr",
        (
            ("bir", 25), ("ve", 24), ("bu", 15), ("da", 10), ("de", 10),
            ("için", 8), ("ile", 7), ("olarak", 5), ("çok", 5),
            ("daha", 5), ("gibi", 5), ("ama", 4), ("en", 4), ("ki", 4),
            ("ne", 4), ("o", 4), ("var", 4), ("olan", 4), ("sonra", 3),
            ("kadar", 3), ("değil", 3), ("her", 3), ("ben", 3),
            ("diye", 2), ("ise", 2), ("ya", 2), ("şey", 2), ("yok", 2),
            ("nasıl", 2), ("şu", 2), ("ancak", 2), ("biz", 2),
            ("kendi", 2), ("arasında", 2), ("olduğunu", 2),
            ("olduğu", 2), ("oldu", 2), ("böyle", 2), ("veya", 2),
            ("mi", 2), ("bütün", 1), ("tüm", 1), ("hem", 1),
            ("bana", 1), ("beni", 1), ("sen", 1), ("siz", 1),
            ("onlar", 1), ("üzerine", 1), ("niye", 1), ("çünkü", 2),
            ("göre", 2), ("zaman", 2), ("önce", 2), ("iki", 2),
            ("eden", 1), ("hiç", 1), ("pek", 1),
        ),
    ),
    (
        "id",
        (
            ("yang", 35), ("dan", 30), ("di", 25), ("itu", 12),
            ("dengan", 12), ("ini", 12), ("untuk", 11), ("dari", 10),
            ("dalam", 9), ("tidak", 9), ("akan", 8), ("pada", 8),
            ("juga", 7), ("ke", 6), ("ada", 6), ("adalah", 6),
            ("orang", 4), ("mereka", 4), ("sudah", 4), ("saya", 4),
            ("kita", 4), ("atau", 4), ("bisa", 4), ("telah", 4),
            ("oleh", 4), ("bahwa", 4), ("saat", 3), ("seperti", 3),
            ("karena", 3), ("hanya", 3), ("lebih", 3), ("tersebut", 3),
            ("sebagai", 3), ("dapat", 3), ("menjadi", 3), ("masih", 2),
            ("kami", 2), ("jika", 2), ("para", 2), ("banyak", 2),
            ("harus", 2), ("secara", 2), ("namun", 2), ("serta", 2),
            ("satu", 2), ("sangat", 2), ("setelah", 2), ("tentang", 2),
            ("anda", 2), ("dia", 2), ("ia", 2), ("kata", 2),
            ("sampai", 1), ("dua", 1), ("belum", 1), ("pun", 1),
            ("terhadap", 1), ("melakukan", 1),
        ),
    ),
    (
        "vi",
        (
            ("của", 25), ("và", 22), ("là", 20), ("có", 18),
            ("không", 15), ("được", 13), ("một", 12), ("trong", 12),
            ("cho", 10), ("đã", 10), ("các", 10), ("người", 9),
            ("này", 9), ("những", 9), ("với", 9), ("để", 9), ("khi", 7),
            ("cũng", 7), ("về", 7), ("như", 6), ("từ", 6), ("mà", 5),
            ("nhưng", 5), ("đó", 5), ("ra", 5), ("thì", 5), ("đến", 5),
            ("vào", 5), ("sẽ", 5), ("lại", 4), ("trên", 4), ("tôi", 4),
            ("còn", 4), ("nhiều", 4), ("làm", 4), ("theo", 3),
            ("tại", 3), ("bị", 3), ("rất", 3), ("vì", 3), ("sau", 3),
            ("chỉ", 3), ("việc", 3), ("đang", 3), ("phải", 3),
            ("hơn", 3), ("họ", 3), ("anh", 3), ("nếu", 2), ("hay", 2),
            ("ông", 2), ("nên", 2), ("nó", 2), ("mình", 2), ("gì", 2),
            ("đây", 2), ("thế", 2), ("ai", 1), ("bà", 1),
        ),
    ),
    (
        "cs",
        (
            ("a", 35), ("se", 28), ("v", 28), ("na", 22), ("je", 17),
            ("že", 15), ("s", 12), ("z", 11), ("do", 10), ("to", 10),
            ("i", 9), ("o", 8), ("k", 7), ("ale", 6), ("za", 5),
            ("jako", 5), ("po", 5), ("pro", 5), ("si", 5), ("tak", 5),
            ("od", 4), ("jsou", 4), ("byl", 4), ("jsem", 4), ("co", 4),
            ("jak", 4), ("který", 3), ("která", 3), ("které", 3),
            ("už", 3), ("jeho", 3), ("byla", 3), ("bylo", 3),
            ("být", 3), ("podle", 3), ("jen", 3), ("když", 3),
            ("nebo", 3), ("při", 3), ("také", 3), ("má", 3),
            ("není", 3), ("bude", 3), ("ještě", 2), ("může", 2),
            ("však", 2), ("až", 2), ("mezi", 2), ("před", 2),
            ("pak", 2), ("tam", 2), ("kde", 2), ("byly", 2), ("ho", 2),
            ("mi", 2), ("my", 1), ("vy", 1), ("ty", 1), ("její", 1),
        ),
    ),
    (
        "ro",
        (
            ("de", 40), ("și", 35), ("în", 28), ("a", 25), ("la", 18),
            ("cu", 15), ("să", 15), ("pe", 13), ("care", 12),
            ("din", 12), ("o", 12), ("nu", 12), ("este", 10),
            ("un", 10), ("mai", 10), ("se", 10), ("ce", 8),
            ("pentru", 8), ("au", 6), ("lui", 5), ("sunt", 5),
            ("dar", 4), ("al", 4), ("fost", 4), ("sau", 4), ("după", 4),
            ("fi", 4), ("dacă", 3), ("când", 3), ("prin", 3), ("ar", 3),
            ("cum", 3), ("acest", 3), ("această", 3), ("el", 3),
            ("va", 3), ("doar", 3), ("foarte", 3), ("până", 3),
            ("ei", 3), ("le", 3), ("între", 2), ("fie", 2), ("asta", 2),
            ("ea", 2), ("noi", 2), ("vor", 2), ("unde", 2), ("toate", 2),
            ("își", 2), ("îi", 2), ("fără", 2), ("peste", 2),
            ("încă", 2), ("sub", 1), ("către", 1), ("aceasta", 1),
            ("două", 1),
        ),
    ),
)

#: Sublinear damping: per-word weights cap here when compiled.  The
#: ultra-frequent words are exactly the ones SHARED across languages
#: ("de" es/fr/pt/nl, "que" es/pt, "a" en/es/fr/it/pt ...), so raw
#: sums let one shared word outvote a sentence of distinctive
#: mid-frequency words; capping (the tf-sublinearity move) keeps the
#: decision with the distinctive vocabulary.
WEIGHT_CAP = 30

#: language codes in argmax tie order
LATIN_LANGS: tuple[str, ...] = tuple(lang for lang, _ in STOPWORD_FREQ)

#: tokenizer shared by the Spark expression and the SQL oracle: lower-
#: case, split on any non-letter run (keeps accented letters together)
TOKEN_SPLIT_RE = r"[^\p{L}]+"


#: family tuple = (freq table, token split regex) — the generic
#: machinery below is parameterized on both so the SAME builders serve
#: the Latin tables here and the per-script families in
#: :mod:`.script_families` (Cyrillic ru/uk/bg/sr, Arabic-script
#: ar/fa/ur, Devanagari hi/mr/ne).  The Latin tokenizer splits on
#: non-letters; abugida/abjad families must KEEP combining marks
#: (``\p{M}``) inside tokens — Devanagari matras and the virama are
#: Mn, so splitting on bare non-letters would shred की into क.
FreqTable = tuple[tuple[str, tuple[tuple[str, int], ...]], ...]


def family_langs(freq: FreqTable) -> tuple[str, ...]:
    """Language codes of a table, in argmax tie order."""
    return tuple(lang for lang, _ in freq)


def _weight_vocab(freq: FreqTable = STOPWORD_FREQ) -> dict[str, list[int]]:
    """word -> weight vector (one slot per language, table order)."""
    vocab: dict[str, list[int]] = {}
    for i, (_lang, words) in enumerate(freq):
        for word, weight in words:
            vocab.setdefault(word, [0] * len(freq))[i] = min(
                weight, WEIGHT_CAP
            )
    return dict(sorted(vocab.items()))


def _toks_sql(text_col: str, token_re: str) -> str:
    """Shared Spark tokenizer: lower-case, split on the family's
    delimiter class.  ``token_re`` is a Java regex; backslashes double
    for the SQL string literal."""
    return "split(lower({c}), '{r}')".format(
        c=text_col, r=token_re.replace("\\", "\\\\")
    )


def _fold_sql(
    text_col: str,
    indicator: bool,
    freq: FreqTable = STOPWORD_FREQ,
    token_re: str = TOKEN_SPLIT_RE,
    flat: bool = False,
) -> str:
    """SQL for a per-document vector fold over the token stream — the
    ONE shared implementation behind scores (per-language weight sums)
    and hits (per-language 0/1 coverage counts): map lookup per token
    (misses filter out), zip_with fold of the hits.  The map/array
    literals are constants; everything stays JVM-side.  A tokenizer or
    fold fix lands here ONCE for both vectors (and the oracle
    generator mirrors the same tables).

    Lookup shape (round-11, verdict ask #6): a Spark map LITERAL is an
    ``ArrayBasedMapData`` — ``map(...)[w]`` is a LINEAR scan over every
    key, so the flat ~900-word vocabulary at 16 tables made each token
    pay the whole vocab (docs_latin_langid doubled when the tables
    grew 7 -> 16).  The vocabulary is therefore PARTITIONED BY FIRST
    LETTER into a two-level map literal:
    ``outer[substring(w, 1, 1)][w]`` scans ~40 first-letter buckets
    then ~20 bucket words instead of ~900.  Measured honestly (round
    12, sf0.1 fixture line): the full query reads 1.3s prefixed vs
    2.4s flat — ~1.8x, NOT the isolated-fold 2.5-4x previously quoted,
    because tokenize (0.18s) and the zip_with fold (0.45s) sit outside
    the lookup (0.85s); and the r11 BENCH line did not move at all
    because the sf0.1 scan is ONE partition, serializing the whole
    fold on one core — fixed round 12 by the dedup-family ``_spread``
    repartition in the registry queries.  Results EQUAL BY
    CONSTRUCTION (same words,
    same vectors; a miss is NULL at either level and filters out),
    which beats any heuristic candidate-table prefilter: no behavior
    cliff for diacritic-stripped informal text, nothing to re-verify
    when tables change.  ``flat=True`` keeps the naive single-map shape
    for the equality test (tests/test_latin_langid.py pins
    prefix-partitioned == flat over the fixture matrix and Hypothesis
    text)."""
    n = len(freq)

    def fmt_vec(vec: list[int]) -> str:
        return ", ".join(
            (("1L" if x else "0L") if indicator else f"{x}L") for x in vec
        )

    def _sql_str(s: str) -> str:
        # Spark's string-literal parser processes BACKSLASH escapes:
        # a word containing \ or ' must escape both or the literal
        # (and for the JSON encoding below, the embedded JSON) silently
        # corrupts — from_json is permissive and would return a NULL
        # map, classifying every document as the zero-hit default with
        # no error anywhere (round-12 review finding)
        return s.replace("\\", "\\\\").replace("'", "\\'")

    vocab = _weight_vocab(freq)
    if flat:
        entries = ", ".join(
            "'{w}', array({v})".format(w=_sql_str(word), v=fmt_vec(vec))
            for word, vec in vocab.items()
        )
        lookup = f"map({entries})[w]"
    else:
        # Round-12 encoding: the two-level map ships as ONE JSON string
        # literal through from_json (constant inputs -> evaluated once,
        # never per row).  The round-11 map(...) literal shape built a
        # ~15k-node expression tree that cost ~0.75s of parse+analysis
        # per QUERY BUILD — more than the whole distributed execution —
        # because every literal word and weight was its own Catalyst
        # node; as one string node, build drops to ~0.07s and per-task
        # setup shrinks too (measured round 12: the sf0.1 bench line
        # fell 1.2s -> ~0.4s with results equal by construction — the
        # flat= equality tests now pin from_json == naive map literal).
        import json

        buckets: dict[str, dict[str, list[int]]] = {}
        for word, vec in vocab.items():
            buckets.setdefault(word[0], {})[word] = [
                (min(x, 1) if indicator else x) for x in vec
            ]
        js = _sql_str(
            json.dumps(
                dict(sorted(buckets.items())),
                ensure_ascii=False,
                separators=(",", ":"),
            )
        )
        lookup = (
            f"from_json('{js}', 'map<string,map<string,array<bigint>>>')"
            f"[substring(w, 1, 1)][w]"
        )
    toks = _toks_sql(text_col, token_re)
    return (
        f"aggregate("
        f"filter(transform({toks}, w -> {lookup}), v -> v IS NOT NULL), "
        f"array_repeat(CAST(0 AS BIGINT), {n}), "
        f"(acc, v) -> zip_with(acc, v, (x, y) -> x + y))"
    )


def _scores_sql(
    text_col: str,
    freq: FreqTable = STOPWORD_FREQ,
    token_re: str = TOKEN_SPLIT_RE,
    flat: bool = False,
) -> str:
    """Per-document score vector (weighted fold) — see :func:`_fold_sql`."""
    return _fold_sql(
        text_col, indicator=False, freq=freq, token_re=token_re, flat=flat
    )


def stopword_scores(text_col: str = "text") -> Column:
    """Per-document function-word score vector (``array<bigint>``, one
    slot per :data:`LATIN_LANGS` entry) — the classifier's evidence,
    exposed for auditing and thresholding."""
    return F.expr(_scores_sql(text_col))


def _ntokens_sql(text_col: str, token_re: str = TOKEN_SPLIT_RE) -> str:
    """Non-empty token count, agreed byte-for-byte with the oracle's
    ``len(list_filter(...))`` (split can emit empty edge tokens)."""
    toks = _toks_sql(text_col, token_re)
    return f"size(filter({toks}, w -> w <> ''))"


def _hits_sql(
    text_col: str,
    freq: FreqTable = STOPWORD_FREQ,
    token_re: str = TOKEN_SPLIT_RE,
    flat: bool = False,
) -> str:
    """Per-language HIT-COUNT vector (0/1 indicator fold, feeds the
    ``und_floor`` coverage test) — see :func:`_fold_sql`."""
    return _fold_sql(
        text_col, indicator=True, freq=freq, token_re=token_re, flat=flat
    )


def predicted_lang_family(
    freq: FreqTable,
    text_col: str = "text",
    default: str = "en",
    und_floor: float | None = None,
    token_re: str = TOKEN_SPLIT_RE,
    flat: bool = False,
) -> Column:
    """Intra-script language ID over any function-word table: argmax of
    the score vector with table tuple order breaking ties; a text with
    ZERO function-word hits (code, name lists, an untabled language)
    falls back to ``default`` — the script's web prior, and adding a
    language = adding a table row.

    ``und_floor`` (confidence floor, round-9 verdict ask): when set,
    a document labels ``und`` unless the WINNING language's function
    words cover at least that fraction of its tokens — the honest
    signal for untabled languages and word-salad, so per-language
    downstream stages (LM gating trains per language) stop silently
    ingesting mislabeled text.  Coverage, not score mass, is the robust
    test: a language sharing one ultra-frequent token with a tabled
    language (the Hungarian article ``a`` scores in eight Latin tables)
    can pile up score, but its winning-language HIT COUNT stays a
    sliver of its tokens, while genuine prose in any tabled language is
    ~30-50% function words.  The comparison runs in integers
    (``hits*1000 < floor_milli*n_tokens``) so both engines decide
    boundary documents identically.

    The score vector is bound ONCE as a lambda variable (the
    single-element-array + transform trick from ``word_shingles``), so
    the token fold runs once per document, not once per comparison."""
    langs = family_langs(freq)
    branches = " ".join(
        f"WHEN s[{i}] = array_max(s) THEN '{lang}'"
        for i, lang in enumerate(langs)
    )
    floor_case = ""
    if und_floor is not None:
        floor_milli = int(round(und_floor * 1000))
        # winner's hit count: element_at(h, array_position(s, max)) —
        # array_position returns the FIRST max (1-based), matching the
        # argmax tie order
        winner_hits = (
            f"element_at({_hits_sql(text_col, freq, token_re, flat)}, "
            f"CAST(array_position(s, array_max(s)) AS INT))"
        )
        floor_case = (
            f"WHEN {winner_hits} * 1000 < {floor_milli} * "
            f"{_ntokens_sql(text_col, token_re)} THEN 'und' "
        )
    # floor case FIRST: zero-hit NON-EMPTY text is exactly the
    # untabled-language signal und exists for; tokenless text (ntokens
    # 0 makes the floor comparison false) still falls to ``default``
    return F.expr(
        f"transform(array({_scores_sql(text_col, freq, token_re, flat)}), s -> "
        f"CASE {floor_case}WHEN array_max(s) <= 0 THEN '{default}' "
        f"{branches} END)[0]"
    )


def predicted_lang_latin(
    text_col: str = "text",
    default: str = "en",
    und_floor: float | None = None,
    flat: bool = False,
) -> Column:
    """Latin-script language ID over :data:`STOPWORD_FREQ` — see
    :func:`predicted_lang_family` for semantics (argmax, tie order,
    zero-hit default, und coverage floor)."""
    return predicted_lang_family(
        STOPWORD_FREQ,
        text_col,
        default=default,
        und_floor=und_floor,
        flat=flat,
    )


def family_scores(
    freq: FreqTable, text_col: str = "text", token_re: str = TOKEN_SPLIT_RE
) -> Column:
    """Per-document score vector for any family table (``array<bigint>``,
    one slot per table row) — the classifier's auditable evidence."""
    return F.expr(_scores_sql(text_col, freq, token_re))


def _duck_toks(text_col: str, token_re: str) -> str:
    """Shared DuckDB tokenizer (RE2 supports the same ``\\p{L}``/
    ``\\p{M}`` classes the Java regex uses)."""
    return (
        "string_split_regex(lower(" + text_col + "), '" + token_re + "')"
    )


def oracle_scores_sql(
    text_col: str = "text",
    freq: FreqTable = STOPWORD_FREQ,
    token_re: str = TOKEN_SPLIT_RE,
) -> dict[str, str]:
    """DuckDB replication of the scoring, GENERATED from the same
    tables: language -> SQL expression for that language's score.  The
    oracle classifies with literally the same weights and tokenizer, so
    a Spark/DuckDB hash mismatch means a real engine divergence, not a
    re-keyed fixture."""
    toks = _duck_toks(text_col, token_re)
    out: dict[str, str] = {}
    for lang, words in freq:
        cases = " ".join(
            "WHEN '{w}' THEN {x}".format(
                w=word.replace("'", "''"), x=min(weight, WEIGHT_CAP)
            )
            for word, weight in words
        )
        out[lang] = (
            "list_sum(list_transform(" + toks + ", w -> CASE w " + cases +
            " ELSE 0 END))"
        )
    return out


def oracle_langid_select(
    doc_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "lang",
    default: str = "en",
    und_floor: float | None = None,
    score_col: str | None = None,
    freq: FreqTable = STOPWORD_FREQ,
    token_re: str = TOKEN_SPLIT_RE,
) -> str:
    """Full DuckDB SELECT replicating :func:`predicted_lang_family`
    (Latin table by default) over ``doc_sql`` (a subquery producing
    ``(id_col, text_col)``), layered so each language's score computes
    ONCE: inner select materializes the per-language score columns,
    outer CASE does argmax with the same tie order, confidence floor
    (``und_floor``, the same integer winner-hit-coverage comparison)
    and zero-hit default as the Spark side.  ``score_col`` additionally
    surfaces the winning score as BIGINT."""
    langs = family_langs(freq)
    scores = oracle_scores_sql(text_col, freq, token_re)
    inner_cols = ", ".join(
        "(" + scores[lang] + ") AS s_" + lang for lang in langs
    )
    toks = _duck_toks(text_col, token_re)
    ntoks = "len(list_filter(" + toks + ", w -> w <> ''))"
    best = "greatest(" + ", ".join("s_" + lang for lang in langs) + ")"
    branches = " ".join(
        "WHEN s_" + lang + " = " + best + " THEN '" + lang + "'"
        for lang in langs
    )
    floor_case = ""
    inner_extra = ""
    if und_floor is not None:
        floor_milli = int(round(und_floor * 1000))
        # per-language hit-count columns (0/1 indicator folds), then the
        # winner's hits picked by the SAME first-max tie order
        for lang, words in freq:
            cases = " ".join(
                "WHEN '{w}' THEN 1".format(w=word.replace("'", "''"))
                for word, _weight in words
            )
            inner_extra += (
                ", (list_sum(list_transform(" + toks + ", w -> CASE w "
                + cases + " ELSE 0 END))) AS h_" + lang
            )
        inner_extra += ", (" + ntoks + ") AS n_toks"
        winner_hits = (
            "(CASE "
            + " ".join(
                "WHEN s_" + lang + " = " + best + " THEN h_" + lang
                for lang in langs
            )
            + " END)"
        )
        floor_case = (
            "WHEN " + winner_hits + " * 1000 < " + str(floor_milli)
            + " * n_toks THEN 'und' "
        )
    score_sel = ""
    if score_col is not None:
        score_sel = ", CAST(" + best + " AS BIGINT) AS " + score_col
    return (
        "SELECT " + id_col + ", CASE " + floor_case + "WHEN " + best
        + " <= 0 THEN '" + default + "' " + branches + " END AS " + out_col
        + score_sel
        + " FROM (SELECT " + id_col + ", " + inner_cols + inner_extra
        + " FROM (" + doc_sql + "))"
    )

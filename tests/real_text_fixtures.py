"""Genuine-language calibration fixtures for the script-aware gates.

Round 12: the round-11 script-aware machinery was validated only on
TRANSLITERATED synthetics (Latin text mapped char-for-char onto a
26-symbol script alphabet) — that proves Spark/DuckDB expression
parity, not linguistic fit.  This module checks in small samples of
REAL prose per unsegmented script so the calibration constants (the
chars-per-word divisors, the function-particle lists, the terminal
punctuation sets) are pinned against actual language.

Sources: short original prose compositions plus sentences adapted from
the Universal Declaration of Human Rights translations (public
domain).  Each entry is fluent, natural text in the script — NOT
transliterated testdata.

``SEGMENTED`` carries hand-word-segmented versions (words separated by
``|``) for every fixture language — zh/ja/th/lo since r12a, km/my/bo
since r12c — so all seven scripts calibrate their chars-per-word
divisors against real segmentation (plus the weaker invariants:
particle coverage, unsegmented ratio, gate survival of fluent vs
garbage text).  Segmentation conventions per script are noted inline;
the km/my/bo sentences are simple declarative prose where word
boundaries are uncontroversial, which is exactly why the fixtures are
short.
"""

# fluent sentences per language (unsegmented scripts only)
REAL_SENTENCES: dict[str, list[str]] = {
    "zh": [
        "人人生而自由，在尊严和权利上一律平等。",
        "他们赋有理性和良心，并应以兄弟关系的精神相对待。",
        "今天的天气很好，我们在公园里散步，看到了很多美丽的花。",
        "他是一位有经验的老师，学生们都很喜欢他的课。",
        "科学技术的发展改变了人们的生活方式。",
        "这本书是图书馆新买的，内容非常有意思。",
    ],
    "ja": [
        "すべての人間は、生まれながらにして自由であり、尊厳と権利について平等である。",
        "人間は理性と良心を持っており、互いに同胞の精神をもって行動しなければならない。",
        "今日は天気がいいので、公園を散歩しました。",
        "彼は経験豊かな先生で、学生たちは彼の授業が大好きです。",
        "科学技術の発展は人々の生活を大きく変えた。",
    ],
    "th": [
        "มนุษย์ทั้งปวงเกิดมามีอิสระและเสมอภาคกันในศักดิ์ศรีและสิทธิ",
        "วันนี้อากาศดีมากเราไปเดินเล่นในสวนสาธารณะ",
        "เขาเป็นครูที่มีประสบการณ์นักเรียนชอบเรียนกับเขามาก",
        "หนังสือเล่มนี้เป็นของห้องสมุดที่โรงเรียนได้ซื้อมาใหม่",
        "เทคโนโลยีได้เปลี่ยนวิถีชีวิตของผู้คนไปอย่างมาก",
    ],
    "lo": [
        "ມະນຸດທຸກຄົນເກີດມາມີສິດເສລີພາບແລະຄວາມສະເໝີພາບ",
        "ມື້ນີ້ອາກາດດີຫຼາຍພວກເຮົາໄປຍ່າງຫຼິ້ນໃນສວນ",
        "ລາວເປັນຄູທີ່ມີປະສົບການຫຼາຍປີ",
        "ປຶ້ມຫົວນີ້ແມ່ນຂອງໂຮງຮຽນໄດ້ຊື້ມາໃໝ່",
        "ເຕັກໂນໂລຊີໄດ້ປ່ຽນຊີວິດຂອງຜູ້ຄົນຢ່າງຫຼວງຫຼາຍ",
    ],
    "km": [
        "មនុស្សទាំងអស់កើតមកមានសេរីភាពនិងសមភាពក្នុងសិទ្ធិ។",
        "គាត់ជាគ្រូបង្រៀនដែលមានបទពិសោធន៍ច្រើនឆ្នាំ។",
        "យើងបានទៅផ្សារជាមួយគ្នានៅថ្ងៃនេះ។",
        "សៀវភៅនេះជារបស់បណ្ណាល័យនៃសាលារៀន។",
        "បច្ចេកវិទ្យាបានផ្លាស់ប្ដូរជីវិតរបស់មនុស្សជាច្រើន។",
    ],
    "my": [
        "လူတိုင်းသည်လွတ်လပ်စွာမွေးဖွားလာကြသည်။",
        "သူသည်အတွေ့အကြုံရှိသောဆရာဖြစ်သည်။",
        "ကျွန်တော်တို့သည်ယနေ့ဈေးကိုသွားကြသည်။",
        "ဤစာအုပ်သည်ကျောင်း၏စာကြည့်တိုက်မှာရှိသည်။",
        "မိခင်နှင့်ကလေးသည်ဥယျာဉ်ထဲမှာလမ်းလျှောက်ကြသည်။",
    ],
    "bo": [
        "འགྲོ་བ་མི་རིགས་ཡོངས་ལ་རང་དབང་དང་ཐོབ་ཐང་འདྲ་མཉམ་ཡོད།",
        "ཁོ་ནི་ཉམས་མྱོང་ཅན་གྱི་དགེ་རྒན་ཞིག་ཡིན།",
        "ང་ཚོ་དེ་རིང་གླིང་ཀར་འགྲོ་གི་ཡོད།",
        "དེབ་འདི་སློབ་གྲྭའི་དཔེ་མཛོད་ནས་ཡིན།",
        "ཁོས་ལས་ཀ་མང་པོ་བྱས་པ་རེད།",
    ],
}

# hand-word-segmented sentences (words separated by '|', punctuation
# kept as its own segment and dropped by the calibration test) — only
# for the languages where the segmentation is confidently known
SEGMENTED: dict[str, list[str]] = {
    "zh": [
        "人人|生|而|自由|，|在|尊严|和|权利|上|一律|平等|。",
        "他们|赋有|理性|和|良心|，|并|应|以|兄弟|关系|的|精神|相|对待|。",
        "今天|的|天气|很|好|，|我们|在|公园|里|散步|，|看到|了|很多|美丽|的|花|。",
        "他|是|一位|有|经验|的|老师|，|学生们|都|很|喜欢|他|的|课|。",
        "科学|技术|的|发展|改变|了|人们|的|生活|方式|。",
    ],
    "ja": [
        "すべて|の|人間|は|、|生まれ|ながら|に|して|自由|で|あり|、|尊厳|と|権利|に|ついて|平等|で|ある|。",
        "今日|は|天気|が|いい|ので|、|公園|を|散歩|し|まし|た|。",
        "彼|は|経験|豊か|な|先生|で|、|学生|たち|は|彼|の|授業|が|大好き|です|。",
    ],
    "th": [
        "มนุษย์|ทั้งปวง|เกิด|มา|มี|อิสระ|และ|เสมอภาค|กัน|ใน|ศักดิ์ศรี|และ|สิทธิ",
        "วันนี้|อากาศ|ดี|มาก|เรา|ไป|เดินเล่น|ใน|สวน|สาธารณะ",
        "เขา|เป็น|ครู|ที่|มี|ประสบการณ์|นักเรียน|ชอบ|เรียน|กับ|เขา|มาก",
    ],
    # r12b: Lao hand-segmentation (Thai-cognate orthography; word
    # boundaries follow the same conventions as the Thai segmentation
    # above — nominalizing prefixes kept with their stem)
    "lo": [
        "ມະນຸດ|ທຸກ|ຄົນ|ເກີດ|ມາ|ມີ|ສິດ|ເສລີພາບ|ແລະ|ຄວາມສະເໝີພາບ",
        "ມື້ນີ້|ອາກາດ|ດີ|ຫຼາຍ|ພວກເຮົາ|ໄປ|ຍ່າງ|ຫຼິ້ນ|ໃນ|ສວນ",
        "ລາວ|ເປັນ|ຄູ|ທີ່|ມີ|ປະສົບການ|ຫຼາຍ|ປີ",
    ],
    # r12c: Khmer (compound nouns like គ្រូបង្រៀន 'teacher' and
    # derived nominals like បទពិសោធន៍ 'experience' kept whole —
    # the convention behind the 6-chars/word divisor; ថ្ងៃ|នេះ
    # 'day|this' split like the zh 今天 analogue is NOT)
    "km": [
        "មនុស្ស|ទាំងអស់|កើត|មក|មាន|សេរីភាព|និង|សមភាព|ក្នុង|សិទ្ធិ|។",
        "គាត់|ជា|គ្រូបង្រៀន|ដែល|មាន|បទពិសោធន៍|ច្រើន|ឆ្នាំ|។",
        "យើង|បាន|ទៅ|ផ្សារ|ជាមួយ|គ្នា|នៅ|ថ្ងៃ|នេះ|។",
        "សៀវភៅ|នេះ|ជា|របស់|បណ្ណាល័យ|នៃ|សាលារៀន|។",
        "បច្ចេកវិទ្យា|បាន|ផ្លាស់ប្ដូរ|ជីវិត|របស់|មនុស្ស|ជាច្រើន|។",
    ],
    # r12c: Burmese (grammatical particles သည်/ကို/၏/မှာ and the
    # plural ကြ are their own segments; compound nouns like
    # စာကြည့်တိုက် 'library' kept whole; the adverbializer စွာ
    # split from its stem)
    "my": [
        "လူတိုင်း|သည်|လွတ်လပ်|စွာ|မွေးဖွား|လာ|ကြ|သည်|။",
        "သူ|သည်|အတွေ့အကြုံ|ရှိ|သော|ဆရာ|ဖြစ်|သည်|။",
        "ကျွန်တော်|တို့|သည်|ယနေ့|ဈေး|ကို|သွား|ကြ|သည်|။",
        "ဤ|စာအုပ်|သည်|ကျောင်း|၏|စာကြည့်တိုက်|မှာ|ရှိ|သည်|။",
        "မိခင်|နှင့်|ကလေး|သည်|ဥယျာဉ်|ထဲ|မှာ|လမ်းလျှောက်|ကြ|သည်|။",
    ],
    # r12c: Tibetan (trailing tsheg ་ kept WITH its word — it is word
    # material per TIBETAN_LETTER_CLASS; two-syllable lexemes like
    # རང་དབང 'freedom' / དཔེ་མཛོད 'library' are single words;
    # case particles ལ/གི/ནས and auxiliaries are their own segments)
    "bo": [
        "འགྲོ་བ་|མི་རིགས་|ཡོངས་|ལ་|རང་དབང་|དང་|ཐོབ་ཐང་|འདྲ་མཉམ་|ཡོད|།",
        "ཁོ་|ནི་|ཉམས་མྱོང་|ཅན་|གྱི་|དགེ་རྒན་|ཞིག་|ཡིན|།",
        "ང་ཚོ་|དེ་རིང་|གླིང་ཀར་|འགྲོ་|གི་|ཡོད|།",
        "དེབ་|འདི་|སློབ་གྲྭའི་|དཔེ་མཛོད་|ནས་|ཡིན|།",
        "ཁོས་|ལས་ཀ་|མང་པོ་|བྱས་|པ་|རེད|།",
    ],
}

#: per-language garbage: uniform random draws over the script's letter
#: range (seeded, deterministic) — fluent-looking to a script detector
#: but carrying no function particles and no natural structure
GARBAGE_RANGES: dict[str, tuple[int, int]] = {
    "zh": (0x4E00, 0x9FFF),
    "ja": (0x3041, 0x3096),   # hiragana letters
    "th": (0x0E01, 0x0E2E),   # consonants only
    "lo": (0x0E81, 0x0EA5),
    "km": (0x1780, 0x17A2),
    "my": (0x1000, 0x1020),
    "bo": (0x0F40, 0x0F6C),
}


def garbage_doc(lang: str, n_chars: int = 240, seed: int = 0) -> str:
    """Deterministic, strictly particle-free script garbage for
    ``lang`` (chars appearing in ANY function particle are rejected, so
    the n_stopwords check sees exactly 0 — a uniform Han draw would hit
    a single-char particle like 的 with ~1% probability otherwise)."""
    import random
    import zlib

    from hermes_spark.functions.text import UNSEGMENTED_PARTICLES

    banned = set("".join(UNSEGMENTED_PARTICLES))
    lo_cp, hi_cp = GARBAGE_RANGES[lang]
    rng = random.Random(zlib.crc32(f"{seed}:{lang}:{n_chars}".encode()))
    out = []
    while len(out) < n_chars:
        c = chr(rng.randint(lo_cp, hi_cp))
        if c not in banned:
            out.append(c)
    return "".join(out)


def fluent_paragraph(lang: str) -> str:
    """All of a language's fixture sentences joined into one document."""
    return "".join(REAL_SENTENCES[lang])

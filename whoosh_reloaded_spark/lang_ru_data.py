"""Russian Snowball suffix tables (data only).

Provenance: Dr Martin Porter's published Russian Snowball algorithm
(snowball.tartarus.org/algorithms/russian/stemmer.html) in the NLTK
transliterated form the reference ships (lang/snowball/russian.py).
Groups whose removal is conditioned on a preceding i^a/a are listed in
*_A_GROUP.  Tuples preserve the longest-first matching order.
"""

PERFECTIVE_GERUND = (
    "ivshis'", "yvshis'", "vshis'", 'ivshi', 'yvshi', 'vshi', 'iv', 'yv',
    'v',
)

PERFECTIVE_A_GROUP = (
    'v', 'vshi', "vshis'",
)

REFLEXIVE = (
    'si^a', "s'",
)

ADJECTIVAL = (
    'ui^ushchi^ui^u', 'ui^ushchi^ai^a', 'ui^ushchimi', 'ui^ushchymi',
    'ui^ushchego', 'ui^ushchogo', 'ui^ushchemu', 'ui^ushchomu',
    'ui^ushchikh', 'ui^ushchykh', 'ui^ushchui^u', 'ui^ushchaia',
    'ui^ushchoi^u', 'ui^ushchei^u', 'i^ushchi^ui^u', 'i^ushchi^ai^a',
    'ui^ushchee', 'ui^ushchie', 'ui^ushchye', 'ui^ushchoe', 'ui^ushchei`',
    'ui^ushchii`', 'ui^ushchyi`', 'ui^ushchoi`', 'ui^ushchem',
    'ui^ushchim', 'ui^ushchym', 'ui^ushchom', 'i^ushchimi', 'i^ushchymi',
    'i^ushchego', 'i^ushchogo', 'i^ushchemu', 'i^ushchomu', 'i^ushchikh',
    'i^ushchykh', 'i^ushchui^u', 'i^ushchai^a', 'i^ushchoi^u',
    'i^ushchei^u', 'i^ushchee', 'i^ushchie', 'i^ushchye', 'i^ushchoe',
    'i^ushchei`', 'i^ushchii`', 'i^ushchyi`', 'i^ushchoi`', 'i^ushchem',
    'i^ushchim', 'i^ushchym', 'i^ushchom', 'shchi^ui^u', 'shchi^ai^a',
    'ivshi^ui^u', 'ivshi^ai^a', 'yvshi^ui^u', 'yvshi^ai^a', 'shchimi',
    'shchymi', 'shchego', 'shchogo', 'shchemu', 'shchomu', 'shchikh',
    'shchykh', 'shchui^u', 'shchai^a', 'shchoi^u', 'shchei^u', 'ivshimi',
    'ivshymi', 'ivshego', 'ivshogo', 'ivshemu', 'ivshomu', 'ivshikh',
    'ivshykh', 'ivshui^u', 'ivshai^a', 'ivshoi^u', 'ivshei^u', 'yvshimi',
    'yvshymi', 'yvshego', 'yvshogo', 'yvshemu', 'yvshomu', 'yvshikh',
    'yvshykh', 'yvshui^u', 'yvshai^a', 'yvshoi^u', 'yvshei^u', 'vshi^ui^u',
    'vshi^ai^a', 'shchee', 'shchie', 'shchye', 'shchoe', 'shchei`',
    'shchii`', 'shchyi`', 'shchoi`', 'shchem', 'shchim', 'shchym',
    'shchom', 'ivshee', 'ivshie', 'ivshye', 'ivshoe', 'ivshei`', 'ivshii`',
    'ivshyi`', 'ivshoi`', 'ivshem', 'ivshim', 'ivshym', 'ivshom', 'yvshee',
    'yvshie', 'yvshye', 'yvshoe', 'yvshei`', 'yvshii`', 'yvshyi`',
    'yvshoi`', 'yvshem', 'yvshim', 'yvshym', 'yvshom', 'vshimi', 'vshymi',
    'vshego', 'vshogo', 'vshemu', 'vshomu', 'vshikh', 'vshykh', 'vshui^u',
    'vshai^a', 'vshoi^u', 'vshei^u', 'emi^ui^u', 'emi^ai^a', 'nni^ui^u',
    'nni^ai^a', 'vshee', 'vshie', 'vshye', 'vshoe', 'vshei`', 'vshii`',
    'vshyi`', 'vshoi`', 'vshem', 'vshim', 'vshym', 'vshom', 'emimi',
    'emymi', 'emego', 'emogo', 'ememu', 'emomu', 'emikh', 'emykh',
    'emui^u', 'emai^a', 'emoi^u', 'emei^u', 'nnimi', 'nnymi', 'nnego',
    'nnogo', 'nnemu', 'nnomu', 'nnikh', 'nnykh', 'nnui^u', 'nnai^a',
    'nnoi^u', 'nnei^u', 'emee', 'emie', 'emye', 'emoe', 'emei`', 'emii`',
    'emyi`', 'emoi`', 'emem', 'emim', 'emym', 'emom', 'nnee', 'nnie',
    'nnye', 'nnoe', 'nnei`', 'nnii`', 'nnyi`', 'nnoi`', 'nnem', 'nnim',
    'nnym', 'nnom', 'i^ui^u', 'i^ai^a', 'imi', 'ymi', 'ego', 'ogo', 'emu',
    'omu', 'ikh', 'ykh', 'ui^u', 'ai^a', 'oi^u', 'ei^u', 'ee', 'ie', 'ye',
    'oe', 'ei`', 'ii`', 'yi`', 'oi`', 'em', 'im', 'ym', 'om',
)

ADJECTIVAL_A_GROUP = (
    'i^ushchi^ui^u', 'i^ushchi^ai^a', 'i^ushchui^u', 'i^ushchai^a',
    'i^ushchoi^u', 'i^ushchei^u', 'i^ushchimi', 'i^ushchymi', 'i^ushchego',
    'i^ushchogo', 'i^ushchemu', 'i^ushchomu', 'i^ushchikh', 'i^ushchykh',
    'shchi^ui^u', 'shchi^ai^a', 'i^ushchee', 'i^ushchie', 'i^ushchye',
    'i^ushchoe', 'i^ushchei`', 'i^ushchii`', 'i^ushchyi`', 'i^ushchoi`',
    'i^ushchem', 'i^ushchim', 'i^ushchym', 'i^ushchom', 'vshi^ui^u',
    'vshi^ai^a', 'shchui^u', 'shchai^a', 'shchoi^u', 'shchei^u',
    'emi^ui^u', 'emi^ai^a', 'nni^ui^u', 'nni^ai^a', 'shchimi', 'shchymi',
    'shchego', 'shchogo', 'shchemu', 'shchomu', 'shchikh', 'shchykh',
    'vshui^u', 'vshai^a', 'vshoi^u', 'vshei^u', 'shchee', 'shchie',
    'shchye', 'shchoe', 'shchei`', 'shchii`', 'shchyi`', 'shchoi`',
    'shchem', 'shchim', 'shchym', 'shchom', 'vshimi', 'vshymi', 'vshego',
    'vshogo', 'vshemu', 'vshomu', 'vshikh', 'vshykh', 'emui^u', 'emai^a',
    'emoi^u', 'emei^u', 'nnui^u', 'nnai^a', 'nnoi^u', 'nnei^u', 'vshee',
    'vshie', 'vshye', 'vshoe', 'vshei`', 'vshii`', 'vshyi`', 'vshoi`',
    'vshem', 'vshim', 'vshym', 'vshom', 'emimi', 'emymi', 'emego', 'emogo',
    'ememu', 'emomu', 'emikh', 'emykh', 'nnimi', 'nnymi', 'nnego', 'nnogo',
    'nnemu', 'nnomu', 'nnikh', 'nnykh', 'emee', 'emie', 'emye', 'emoe',
    'emei`', 'emii`', 'emyi`', 'emoi`', 'emem', 'emim', 'emym', 'emom',
    'nnee', 'nnie', 'nnye', 'nnoe', 'nnei`', 'nnii`', 'nnyi`', 'nnoi`',
    'nnem', 'nnim', 'nnym', 'nnom',
)

VERB = (
    "esh'", 'ei`te', 'ui`te', 'ui^ut', "ish'", 'ete', 'i`te', 'i^ut',
    'nno', 'ila', 'yla', 'ena', 'ite', 'ili', 'yli', 'ilo', 'ylo', 'eno',
    'i^at', 'uet', 'eny', "it'", "yt'", 'ui^u', 'la', 'na', 'li', 'em',
    'lo', 'no', 'et', 'ny', "t'", 'ei`', 'ui`', 'il', 'yl', 'im', 'ym',
    'en', 'it', 'yt', 'i^u', 'i`', 'l', 'n',
)

VERB_A_GROUP = (
    'la', 'na', 'ete', 'i`te', 'li', 'i`', 'l', 'em', 'n', 'lo', 'no',
    'et', 'i^ut', 'ny', "t'", "esh'", 'nno',
)

NOUN = (
    'ii^ami', 'ii^akh', 'i^ami', 'ii^am', 'i^akh', 'ami', 'iei`', 'i^am',
    'iem', 'akh', 'ii^u', "'i^u", 'ii^a', "'i^a", 'ev', 'ov', 'ie', "'e",
    'ei', 'ii', 'ei`', 'oi`', 'ii`', 'em', 'am', 'om', 'i^u', 'i^a', 'a',
    'e', 'i', 'i`', 'o', 'u', 'y', "'",
)

SUPERLATIVE = (
    'ei`she', 'ei`sh',
)

DERIVATIONAL = (
    "ost'", 'ost',
)

CYR_TO_ROM = (
    ("\u0410", 'a'),
    ("\u0430", 'a'),
    ("\u0411", 'b'),
    ("\u0431", 'b'),
    ("\u0412", 'v'),
    ("\u0432", 'v'),
    ("\u0413", 'g'),
    ("\u0433", 'g'),
    ("\u0414", 'd'),
    ("\u0434", 'd'),
    ("\u0415", 'e'),
    ("\u0435", 'e'),
    ("\u0401", 'e'),
    ("\u0451", 'e'),
    ("\u0416", 'zh'),
    ("\u0436", 'zh'),
    ("\u0417", 'z'),
    ("\u0437", 'z'),
    ("\u0418", 'i'),
    ("\u0438", 'i'),
    ("\u0419", 'i`'),
    ("\u0439", 'i`'),
    ("\u041A", 'k'),
    ("\u043A", 'k'),
    ("\u041B", 'l'),
    ("\u043B", 'l'),
    ("\u041C", 'm'),
    ("\u043C", 'm'),
    ("\u041D", 'n'),
    ("\u043D", 'n'),
    ("\u041E", 'o'),
    ("\u043E", 'o'),
    ("\u041F", 'p'),
    ("\u043F", 'p'),
    ("\u0420", 'r'),
    ("\u0440", 'r'),
    ("\u0421", 's'),
    ("\u0441", 's'),
    ("\u0422", 't'),
    ("\u0442", 't'),
    ("\u0423", 'u'),
    ("\u0443", 'u'),
    ("\u0424", 'f'),
    ("\u0444", 'f'),
    ("\u0425", 'kh'),
    ("\u0445", 'kh'),
    ("\u0426", 't^s'),
    ("\u0446", 't^s'),
    ("\u0427", 'ch'),
    ("\u0447", 'ch'),
    ("\u0428", 'sh'),
    ("\u0448", 'sh'),
    ("\u0429", 'shch'),
    ("\u0449", 'shch'),
    ("\u042A", "''"),
    ("\u044A", "''"),
    ("\u042B", 'y'),
    ("\u044B", 'y'),
    ("\u042C", "'"),
    ("\u044C", "'"),
    ("\u042D", 'e`'),
    ("\u044D", 'e`'),
    ("\u042E", 'i^u'),
    ("\u044E", 'i^u'),
    ("\u042F", 'i^a'),
    ("\u044F", 'i^a'),
)

ROM_TO_CYR = (
    ('i^u', "\u044E"),
    ('i^a', "\u044F"),
    ('shch', "\u0449"),
    ('kh', "\u0445"),
    ('t^s', "\u0446"),
    ('ch', "\u0447"),
    ('e`', "\u044D"),
    ('i`', "\u0439"),
    ('sh', "\u0448"),
    ('k', "\u043A"),
    ('e', "\u0435"),
    ('zh', "\u0436"),
    ('a', "\u0430"),
    ('b', "\u0431"),
    ('v', "\u0432"),
    ('g', "\u0433"),
    ('d', "\u0434"),
    ('e', "\u0435"),
    ('z', "\u0437"),
    ('i', "\u0438"),
    ('l', "\u043B"),
    ('m', "\u043C"),
    ('n', "\u043D"),
    ('o', "\u043E"),
    ('p', "\u043F"),
    ('r', "\u0440"),
    ('s', "\u0441"),
    ('t', "\u0442"),
    ('u', "\u0443"),
    ('f', "\u0444"),
    ("''", "\u044A"),
    ('y', "\u044B"),
    ("'", "\u044C"),
)

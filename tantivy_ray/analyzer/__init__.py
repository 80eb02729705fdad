from .analyzer import (  # noqa: F401
    AnalyzedBatch,
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LEN,
    SIMPLE_SPLIT_PATTERN,
    TextAnalyzer,
    TokenizerManager,
    analyze_batch,
    analyzer_for_lang,
    get_analyzer,
    register_analyzer,
)
from .filters import (  # noqa: F401
    AlphaNumOnlyFilter,
    AsciiFoldingFilter,
    LowerCaser,
    RemoveLongFilter,
    SplitCompoundWords,
    Stemmer,
    StopWordFilter,
    ascii_fold,
    lowercase_token_text,
)
from .stemmer import snowball_english_stem  # noqa: F401
from .tokenizers import (  # noqa: F401
    FacetTokenizer,
    NgramTokenizer,
    PreTokenizedStream,
    RawTokenizer,
    RegexTokenizer,
    SimpleTokenizer,
    Token,
    WhitespaceTokenizer,
)

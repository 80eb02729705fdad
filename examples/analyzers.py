"""Tokenizer chains (reference examples/custom_tokenizer.rs,
stop_words.rs, pre_tokenized_text.rs): register a custom analyzer,
stop-word filtering, multilingual stemming, and pre-tokenized input."""

from tantivy_ray.analyzer import (TextAnalyzer, analyzer_for_lang,
                                  get_analyzer, register_analyzer)
from tantivy_ray.analyzer.filters import (LowerCaser, StopWordFilter)
from tantivy_ray.analyzer.tokenizers import (NgramTokenizer,
                                             PreTokenizedStream,
                                             SimpleTokenizer, Token)


def main():
    # custom chain: simple tokenizer → lowercase → english stop words
    register_analyzer("my_stop", TextAnalyzer(
        SimpleTokenizer(), [LowerCaser(), StopWordFilter(language="en")],
        "my_stop"))
    toks = get_analyzer("my_stop").token_texts("The Diary OF a Young Girl")
    print("stopworded:", toks)
    assert toks == ["diary", "young", "girl"]

    # ngram tokenizer (custom_tokenizer.rs registers one for title fields)
    register_analyzer("ngram3", TextAnalyzer(
        NgramTokenizer(3, 3), [LowerCaser()], "ngram3"))
    grams = get_analyzer("ngram3").token_texts("Tan")
    print("3-grams of 'Tan':", grams)
    assert grams == ["tan"]

    # per-language stemming chains (12 Snowball languages)
    de = get_analyzer(analyzer_for_lang("de")).token_texts("Häuser Kinder")
    print("german stems:", de)
    assert de == ["haus", "kind"]

    # pre-tokenized text bypasses the tokenizer entirely
    toks = [Token(text=t, position=i, offset_from=0, offset_to=0)
            for i, t in enumerate(["Hello", "happy", "tax", "payer"])]
    pre = PreTokenizedStream(toks)
    assert [t.text for t in pre.tokenize("ignored")] == \
        ["Hello", "happy", "tax", "payer"]
    print("pre-tokenized ok")


if __name__ == "__main__":
    main()

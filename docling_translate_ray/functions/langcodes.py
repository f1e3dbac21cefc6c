"""Engine language-code tables (M20) — full parity with the reference.

Re-expresses the reference's code mappings verbatim-in-semantics:

* ``NLLB_LANG_CODES`` — ISO-639-1 → FLORES-200 script-tagged codes, the
  complete 31-entry table (/root/reference/src/translation/engines/
  nllb.py:27-58);
* ``LANGUAGE_NAMES`` — codes → prompt-clarifying names
  (/root/reference/src/translation/utils.py:11-24);
* :func:`to_deepl_lang` — DeepL code normalization: explicit map for the
  common codes, else region codes upper-cased whole, else first two letters
  upper-cased (/root/reference/src/translation/utils.py:26-48).

Pure lookup tables — applied vectorized (Arrow dictionary-style probe) in
``pipelines.queries.lang_map_batch``.
"""

from __future__ import annotations

NLLB_LANG_CODES: dict[str, str] = {
    "en": "eng_Latn",
    "ko": "kor_Hang",
    "ja": "jpn_Jpan",
    "zh": "zho_Hans",
    "zh-TW": "zho_Hant",
    "fr": "fra_Latn",
    "de": "deu_Latn",
    "es": "spa_Latn",
    "it": "ita_Latn",
    "pt": "por_Latn",
    "ru": "rus_Cyrl",
    "ar": "arb_Arab",
    "hi": "hin_Deva",
    "th": "tha_Thai",
    "vi": "vie_Latn",
    "id": "ind_Latn",
    "nl": "nld_Latn",
    "pl": "pol_Latn",
    "tr": "tur_Latn",
    "uk": "ukr_Cyrl",
    "cs": "ces_Latn",
    "sv": "swe_Latn",
    "da": "dan_Latn",
    "fi": "fin_Latn",
    "el": "ell_Grek",
    "he": "heb_Hebr",
    "hu": "hun_Latn",
    "ro": "ron_Latn",
    "bg": "bul_Cyrl",
    "no": "nob_Latn",
}

LANGUAGE_NAMES: dict[str, str] = {
    "en": "English",
    "ko": "Korean",
    "ja": "Japanese",
    "zh": "Chinese",
    "fr": "French",
    "de": "German",
    "es": "Spanish",
    "ru": "Russian",
    "it": "Italian",
    "pt": "Portuguese",
    "ar": "Arabic",
    "hi": "Hindi",
    "auto": "the source language",
}

_DEEPL_EXPLICIT: dict[str, str] = {
    "en": "EN",
    "en-us": "EN-US",
    "en-gb": "EN-GB",
    "ko": "KO",
    "ja": "JA",
    "zh": "ZH",
}


def to_deepl_lang(code: str | None) -> str:
    """Project code → DeepL code (utils.py:26-48 semantics; '' for empty)."""
    if not code:
        return ""
    code = code.lower()
    if code in _DEEPL_EXPLICIT:
        return _DEEPL_EXPLICIT[code]
    if "-" in code:
        return code.upper()
    return code[:2].upper()


def to_nllb_lang(code: str | None) -> str:
    """Project code → FLORES-200 code; 'und' when unmapped (nllb.py:60-75
    falls back with a warning — here the sentinel is explicit)."""
    return NLLB_LANG_CODES.get(code or "", "und")

"""WET-style HTML → visible-text extraction, pure codegen.

Common Crawl ships WET files — the visible text of every WARC response
— and every training-data pipeline runs exactly this strip as its first
text stage. The repo already extracts STRUCTURE (links/media spans) with
the Python HTMLParser kernel (`operators/html_extract.py`, the X1/X2
span contract); this module is the complementary BULK path: when all
you want is the text, a chain of JVM-side `regexp_replace` built-ins
stays inside whole-stage codegen — no Python worker, no Arrow hop —
which at 100 TB of HTML is the difference between a scan-rate stage
and a kernel stage.

Engine-portability contract (the repo convention): every pattern is
written in the RE2 ∩ java.util.regex common subset — inline ``(?is)``
flags, lazy quantifiers, character classes only (no backrefs, no
lookaround) — so the DuckDB oracle applies the IDENTICAL chain with
``'g'``-flag `regexp_replace` and must produce byte-identical text.

Stage order matters and is part of the contract:

1. drop ``<script>…</script>`` / ``<style>…</style>`` blocks (their
   CONTENT is not text; a tag-only strip would leak JS/CSS bodies);
2. drop ``<!-- … -->`` comments;
3. strip every remaining tag to a space (block boundaries become
   whitespace, so ``</p><p>`` doesn't glue words);
4. decode character references — the common NAMED set plus each
   target's decimal ``&#NNN;`` and hex ``&#xHH;`` forms (leading
   zeros and either hex-letter case accepted), one step per TARGET
   codepoint so the chain stays ~40 regex passes instead of one per
   spelling; ``&amp;``/``&#38;``/``&#x26;`` LAST so ``&amp;lt;``
   decodes to the literal ``&lt;`` (one level, the HTML spec's
   non-recursive reference rule);
5. collapse whitespace runs and trim. The run class is written out as
   ``[ \\t\\n\\x0B\\f\\r]`` — java's ``\\s`` matches U+000B but RE2's
   does not, so the shorthand is OUTSIDE the common subset (ADVICE r6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Character-reference table: (codepoint, named refs, replacement).
# One chain step per TARGET codepoint decodes every spelling — named,
# decimal (leading zeros tolerated), hex (either case). &nbsp;/&#160;
# deliberately decode to a PLAIN space (the WET convention, and U+00A0
# is outside both engines' whitespace-collapse class). The '&' row is
# NOT here — it must stay the last decode step.
_CHARREFS: list[tuple[int, tuple[str, ...], str]] = [
    (60, ("lt",), "<"),
    (62, ("gt",), ">"),
    (34, ("quot",), '"'),
    (39, ("apos",), "'"),
    (160, ("nbsp",), " "),
    (0x2013, ("ndash",), "–"),
    (0x2014, ("mdash",), "—"),
    (0x2018, ("lsquo",), "‘"),
    (0x2019, ("rsquo",), "’"),
    (0x201C, ("ldquo",), "“"),
    (0x201D, ("rdquo",), "”"),
    (0x2026, ("hellip",), "…"),
    (0x2022, ("bull",), "•"),
    (0xB7, ("middot",), "·"),
    (0xA9, ("copy",), "©"),
    (0xAE, ("reg",), "®"),
    (0x2122, ("trade",), "™"),
    (0xB0, ("deg",), "°"),
    (0xB1, ("plusmn",), "±"),
    (0xD7, ("times",), "×"),
    (0xF7, ("divide",), "÷"),
    (0x20AC, ("euro",), "€"),
    (0xA3, ("pound",), "£"),
    (0xA5, ("yen",), "¥"),
    (0xA2, ("cent",), "¢"),
    (0xA7, ("sect",), "§"),
    (0xB6, ("para",), "¶"),
    (0xAB, ("laquo",), "«"),
    (0xBB, ("raquo",), "»"),
    (0xA1, ("iexcl",), "¡"),
    (0xBF, ("iquest",), "¿"),
]


def _charref_step(cp: int, names: tuple[str, ...], repl: str) -> tuple[str, str]:
    """One (pattern, replacement) decoding every spelling of one
    codepoint. RE2 ∩ java subset: non-capturing alternation + character
    classes only. Hex-letter case tolerance comes from per-letter
    classes ([aA]...), NOT an inline (?i) — a case-insensitive flag
    would also match &LT; etc. for the named forms, which real HTML
    does not use and the strict contract does not decode."""
    hex_cp = "".join(
        f"[{c.lower()}{c}]" if c.isalpha() else c for c in format(cp, "X")
    )
    alts = list(names) + [f"#0*{cp}", f"#[xX]0*{hex_cp}"]
    return (f"&(?:{'|'.join(alts)});", repl)


# (pattern, replacement) chain — applied in order by both engines.
HTML_TEXT_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
    *[_charref_step(cp, names, repl) for cp, names, repl in _CHARREFS],
    _charref_step(38, ("amp",), "&"),   # LAST: one-level decode rule
    (r"[ \t\n\x0B\f\r]+", " "),
]


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document — the WET extraction."""
    out = html
    for pat, rep in HTML_TEXT_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB expression over ``expr`` —
    generated from HTML_TEXT_STEPS so Spark and oracle can never
    drift."""
    out = expr
    for pat, rep in HTML_TEXT_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return f"trim({out})"

"""Deterministic synthetic corpora (FIXTURES.md §1-2) — seed-fixed, no I/O of
external data.  Two generators:

* :func:`gen_pages` — the ``input_hint`` table ``(url, warc_ts, html:binary,
  text, lang)`` of Common-Crawl-style pages built from a template grammar
  (headings, prose, lists, tables, figures+captions, code blocks, formulas,
  nav/header/footer boilerplate, link farms).  Hosts are zipf-skewed so key
  salting is exercised; ~2 % rows are cp949-encoded (decode ladder path,
  reference text_parser.py:137-144) and ~1 % contain a null byte in the first
  8 KiB (binary sniff path, text_parser.py:533-550).
* :func:`gen_docs_text` — text/code-path fixture rows exercising every
  EXTENSION_MAP branch (reference text_parser.py:60-111).

Regenerating with the same seed is byte-identical (no wall clock, no global
random state).
"""

from __future__ import annotations

import datetime as _dt
import random

import pyarrow as pa

LANGS = ["en", "ko", "ja", "de", "fr", "es", "zh"]

_WORDS = (
    "data stream engine block batch arrow parquet shuffle actor pool page "
    "document extract translate sentence span token cluster node worker "
    "table column schema index vector model layout heading caption figure "
    "result value number system process memory buffer object store network"
).split()

_ABBREV_SENT = [
    "Dr. Smith et al. proposed a new method.",
    "The rate was 3.14 per second, i.e. quite fast.",
    "See Fig. 2 for details, cf. Sec. 3.1.",
    'He said "It works." Then we shipped it.',
    "U.S. exports grew by 4.5 percent in Q3.",
]

_FORMULAS = [
    r"E = mc^{2} + \frac{1}{2}mv^{2}",
    r"\sum_{i=0}^{n} x_i &= \int f(x) dx",
    r"a_{n} = \left( \frac{p}{q} \right)^{n}",
]

_CODE_SNIPPETS = [
    "def f(x):\n    return x * 2",
    "for i in range(10):\n    print(i)",
    "SELECT count(*) FROM t GROUP BY k",
]


def _sentence(rng: random.Random) -> str:
    n = rng.randint(5, 14)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random) -> str:
    sents = [_sentence(rng) for _ in range(rng.randint(2, 5))]
    if rng.random() < 0.25:
        sents.insert(rng.randrange(len(sents)), rng.choice(_ABBREV_SENT))
    return " ".join(sents)


def _link_farm(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/l/{rng.randint(0, 999)}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a> '
        for _ in range(rng.randint(8, 16))
    )
    return f"<p>{links}</p>"


def _html_table(rng: random.Random) -> str:
    cols = rng.randint(2, 4)
    rows = rng.randint(2, 4)
    head = "<tr>" + "".join(f"<th>{rng.choice(_WORDS)} col</th>" for _ in range(cols)) + "</tr>"
    body = "".join(
        "<tr>" + "".join(f"<td>{rng.choice(_WORDS)} {rng.randint(0, 99)}</td>" for _ in range(cols)) + "</tr>"
        for _ in range(rows)
    )
    return f"<table><thead>{head}</thead><tbody>{body}</tbody></table>"


def make_html_page(rng: random.Random, title: str) -> str:
    """One page from the template grammar; every branch seed-driven."""
    parts = [
        "<!DOCTYPE html><html><head>",
        f"<title>{title}</title>",
        "<style>body{margin:0}</style>",
        "<script>var x = 1;</script>",
        "</head><body>",
        "<nav><a href='/'>home</a> <a href='/a'>a</a> <a href='/b'>b</a></nav>",
        "<header><p>site chrome to drop</p></header>",
        f"<h1>{title}</h1>",
    ]
    n_sections = rng.randint(1, 4)
    page = 1
    for s in range(n_sections):
        if rng.random() < 0.3:
            page += 1
            parts.append(f'<div class="page" data-page="{page}">')
        parts.append(f"<h2>Section {s + 1}: {rng.choice(_WORDS)} {rng.choice(_WORDS)}</h2>")
        for _ in range(rng.randint(1, 3)):
            parts.append(f"<p>{_paragraph(rng)}</p>")
        roll = rng.random()
        if roll < 0.25:
            parts.append("<ul>" + "".join(f"<li>{_sentence(rng)}</li>" for _ in range(rng.randint(2, 4))) + "</ul>")
        elif roll < 0.45:
            parts.append(_html_table(rng))
        elif roll < 0.6:
            parts.append(
                f"<figure><img src='/img/{rng.randint(0, 99)}.png'/>"
                f"<figcaption>Figure {s + 1}: {_sentence(rng)}</figcaption></figure>"
            )
        elif roll < 0.72:
            parts.append(f"<pre><code>{rng.choice(_CODE_SNIPPETS)}</code></pre>")
        elif roll < 0.82:
            parts.append(f"<p>{rng.choice(_FORMULAS)}</p>")
        if rng.random() < 0.3:
            parts.append(_link_farm(rng))
        if rng.random() < 0.3:
            parts.append(f"<div class='page'>{''}</div>")
    parts.append("<footer><p>copyright boilerplate</p></footer>")
    parts.append("</body></html>")
    return "".join(parts)


def _zipf_host(rng: random.Random, n_hosts: int = 100, a: float = 1.3) -> int:
    # inverse-CDF zipf over a fixed host universe (deterministic given rng)
    weights = [1.0 / (i + 1) ** a for i in range(n_hosts)]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w
        if x < acc:
            return i
    return n_hosts - 1


_BASE_TS = _dt.datetime(2026, 1, 1)


def gen_pages(n_rows: int, seed: int = 42) -> pa.Table:
    """The input_hint pages table: (url, warc_ts, html:binary, text, lang)."""
    urls: list[str] = []
    ts: list[_dt.datetime] = []
    html_bytes: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for i in range(n_rows):
        rng = random.Random((seed << 20) ^ i)  # per-row stream → order-free determinism
        host = _zipf_host(rng)
        url = f"https://host{host}.example/p{i % 17}/{i}"
        title = f"Doc {i} {rng.choice(_WORDS)}"
        page = make_html_page(rng, title)
        body = page.encode("utf-8")
        r = rng.random()
        if r < 0.01:
            body = b"\x00PK\x03\x04" + body[:4096]  # binary-sniff path
        elif r < 0.03:
            body = ("한국어 페이지 " + page).encode("cp949", errors="ignore")  # decode ladder
        urls.append(url)
        ts.append(_BASE_TS + _dt.timedelta(seconds=i * 37 + (i % 97)))
        html_bytes.append(body)
        texts.append(_paragraph(rng) + "\n\n" + _paragraph(rng))
        langs.append(LANGS[rng.randrange(len(LANGS))])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html_bytes, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


_DOCTYPE_EXT = {
    "markdown": "md", "python": "py", "c_style": "c", "shell": "sh",
    "config": "yaml", "plaintext": "txt",
}


def _docs_text_body(rng: random.Random, doctype: str) -> str:
    if doctype == "markdown":
        return (
            f"# {_sentence(rng)}\n\n{_paragraph(rng)}\n\n"
            f"```python\n{rng.choice(_CODE_SNIPPETS)}\n```\n\n{_paragraph(rng)}\n\n"
            f"~~~\n{rng.choice(_CODE_SNIPPETS)}\n~~~\n\n{_paragraph(rng)}"
        )
    if doctype == "python":
        return (
            f'"""Module doc.\n\n{_sentence(rng)}\n"""\n\n'
            f"# {_sentence(rng)}\nx = 1\n\n"
            f"def f():\n    '''{_sentence(rng)}'''\n    return 2  # {rng.choice(_WORDS)}\n"
        )
    if doctype == "c_style":
        return (
            f"// {_sentence(rng)}\nint main() {{\n"
            f"  /* {_sentence(rng)}\n     {_sentence(rng)} */\n"
            f"  return 0; // {rng.choice(_WORDS)}\n}}\n"
        )
    if doctype == "shell":
        return f"#!/bin/bash\n# {_sentence(rng)}\necho hi\n# {_sentence(rng)}\nexit 0\n"
    if doctype == "config":
        return f"key: {rng.choice(_WORDS)}\nother: {rng.randint(0, 99)}\n"
    return f"{_paragraph(rng)}\n\n{_paragraph(rng)}\n\n{_paragraph(rng)}"


def gen_docs_text(n_rows: int, seed: int = 43) -> pa.Table:
    """Text/code-path fixtures, one row per synthetic file (FIXTURES.md §2)."""
    doctypes = list(_DOCTYPE_EXT)
    urls, dts, bodies = [], [], []
    for i in range(n_rows):
        rng = random.Random((seed << 20) ^ i)
        doctype = doctypes[i % len(doctypes)]
        urls.append(f"file:///src/f{i}.{_DOCTYPE_EXT[doctype]}")
        dts.append(doctype)
        bodies.append(_docs_text_body(rng, doctype))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "doctype": pa.array(dts, pa.string()),
            "body": pa.array(bodies, pa.string()),
        }
    )


def doc_row_to_page_html(doc_id: int, text: str, lang: str) -> str:
    """Deterministically wrap one `documents` testdata row as an HTML page.

    Used by ``entry()``/bench to derive an input_hint-shaped pages corpus
    from the driver-provided `documents` table without external data.
    """
    paras = "".join(f"<p>{p}</p>" for p in text.split("\n\n") if p.strip())
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>doc {doc_id}</title><script>var x=0;</script></head><body>"
        "<nav><a href='/'>home</a></nav>"
        f"<h1>Document {doc_id} ({lang})</h1>{paras}"
        "<footer><p>footer</p></footer></body></html>"
    )

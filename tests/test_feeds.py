"""RSS/Atom feed seed extraction (functions/crawl.parse_feed /
feed_seeds) — the fourth crawl-discovery surface."""

import pyarrow as pa

from docling_translate_ray.functions import crawl as fc


def test_rss_items():
    xml = ("<rss><channel><title>chan</title>"
           "<item><title>A</title><link>https://x/a</link>"
           "<pubDate>2024-01-02</pubDate></item>"
           "<item><link>https://x/b</link></item>"
           "<item><title>no link skipped</title></item>"
           "</channel></rss>")
    assert fc.parse_feed(xml) == [
        ("https://x/a", "A", "2024-01-02"),
        ("https://x/b", "", ""),
    ]


def test_atom_entries():
    xml = ('<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
           '<entry><title>E1</title><link href="https://y/1"/>'
           "<updated>2023-09-09</updated></entry>"
           '<entry><link href="https://y/2" rel="alternate"/></entry>'
           "<entry><title>no link</title></entry></feed>")
    assert fc.parse_feed(xml) == [
        ("https://y/1", "E1", "2023-09-09"),
        ("https://y/2", "", ""),
    ]


def test_channel_title_does_not_leak_and_empty_input():
    xml = "<rss><channel><title>chan</title><item><link>u</link></item></channel></rss>"
    assert fc.parse_feed(xml) == [("u", "", "")]
    assert fc.parse_feed("") == []
    assert fc.parse_feed("not xml at all") == []


def test_feed_seeds_dataset(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "host": ["h1", "h2"],
        "feed_xml": [
            "<item><title>t</title><link>https://h1/p</link></item>",
            None,
        ],
    }))
    out = fc.feed_seeds(ds).to_pandas()
    assert [(r.host, r.url, r.title) for r in out.itertuples()] == [
        ("h1", "https://h1/p", "t")]


def test_rss_link_with_attributes_and_selfclosing():
    # attribute-laden <link rel=…> open tags must still match; a
    # self-closing Atom-style <link/> inside an RSS item yields nothing
    assert fc.parse_feed(
        "<item><link rel=\"self\">http://a/x</link>"
        "<title>T</title></item>") == [("http://a/x", "T", "")]
    assert fc.parse_feed("<item><link /><title>T</title></item>") == []

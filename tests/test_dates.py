"""Publish-date extraction (functions/dates.py): ladder precedence,
in-pattern validation, and polars↔DuckDB regex lockstep."""

import pyarrow as pa


def _run(rows):
    from docling_translate_ray.functions.dates import extract_pub_date_batch

    t = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.string()),
    })
    return extract_pub_date_batch(t).to_pylist()


def test_ladder_rungs_and_precedence():
    meta = '<meta property="article:published_time" content="2024-05-03T10:00:00Z">'
    time = '<time datetime="2023-11-30">Nov 30</time>'
    out = _run([
        ("http://a/x", meta + "body"),
        ("http://a/x", time + "body"),
        ("http://a/2022/07/19/post.html", "plain body"),
        ("http://a/x", "released 2021-02-28 worldwide"),
        # precedence: meta beats time beats url beats text
        ("http://a/2022/07/19/p", meta + time + " 2021-02-28 "),
        ("http://a/2022/07/19/p", time + " 2021-02-28 "),
        ("http://a/2022/07/19/p", "x 2021-02-28 y"),
        ("http://a/x", "no date here"),
        (None, None),
    ])
    want = [("2024-05-03", "meta"), ("2023-11-30", "time"),
            ("2022-07-19", "url"), ("2021-02-28", "text"),
            ("2024-05-03", "meta"), ("2023-11-30", "time"),
            ("2022-07-19", "url"), (None, "none"), (None, "none")]
    got = [(r["pub_date"], r["date_source"]) for r in out]
    assert got == want


def test_in_pattern_validation_rejects_impossible_dates():
    out = _run([
        ("http://a/x", "on 2024-13-01 and 2024-00-10 and 2024-05-32"),
        ("http://a/x", "on 1899-05-03"),          # pre-1900 year
        ("http://a/2024/13/01/p", "body"),          # bad month in url
        ("http://a/x", "id 12024-05-03"),           # digit-glued prefix
        ("http://a/x", "v2024-05-035"),             # digit-glued suffix
        ("http://a/x", "ok 2024-05-03"),            # date at end of string
        ("http://a/2024/05/03", "body"),            # url date at $ (no slash)
    ])
    got = [(r["pub_date"], r["date_source"]) for r in out]
    assert got == [(None, "none"), (None, "none"), (None, "none"),
                   (None, "none"), (None, "none"),
                   ("2024-05-03", "text"), ("2024-05-03", "url")]


def test_sql_lockstep_adversarial():
    """The DuckDB ladder (RE2) agrees with the polars kernel
    (rust-regex) value-for-value on boundary-hugging input."""
    import duckdb

    from docling_translate_ray.functions.dates import pub_date_sql_exprs

    rows = [
        ("http://a/2020/01/31/x", "2019-12-31 tail"),
        ("http://a/x2020/01/31/", "start"),          # digit-glued? / anchors
        ("2020/01/31", "no leading slash"),          # url needs leading /
        ("http://a/", "2024-05-03"),                 # whole body IS the date
        ("http://a/", "a2024-05-03"),                # letter-glued (still text)
        ("http://a/", "<time datetime=\"2024-05-03\"><time datetime=\"2020-01-01\">"),
        ("http://a/", '<meta name="x" content="y">'
         '<meta property="article:published_time" content="2024-05-03">'),
        ("http://a/", "…2024-05-03…"),               # unicode neighbours
        ("", ""), (None, None),
        ("http://a/2020/01/31-x", "b"),              # trailing -x kills url rung
    ]
    got = [(r["pub_date"], r["date_source"]) for r in _run(rows)]
    pub, src = pub_date_sql_exprs("url", "html")
    con = duckdb.connect()
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "url": pa.array([r[0] for r in rows], pa.string()),
                  "html": pa.array([r[1] for r in rows], pa.string())})
    con.register("pages", t)
    want = con.execute(
        f"SELECT {pub}, {src} FROM pages ORDER BY doc_id").fetchall()
    assert got == [tuple(w) for w in want]


def test_dataset_wrapper(ray_session):
    import ray.data

    from docling_translate_ray.functions.dates import extract_pub_dates

    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "url": pa.array([f"http://h/2021/06/{i % 28 + 1:02d}/p" if i % 2
                         else "http://h/p" for i in range(200)]),
        "html": pa.array(["no date"] * 200),
    })
    rows = extract_pub_dates(ray.data.from_arrow(t)).take_all()
    assert len(rows) == 200
    for r in rows:
        if r["doc_id"] % 2:
            assert r["date_source"] == "url"
            assert r["pub_date"] == f"2021-06-{r['doc_id'] % 28 + 1:02d}"
        else:
            assert r["date_source"] == "none" and r["pub_date"] is None

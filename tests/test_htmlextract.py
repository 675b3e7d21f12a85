"""HTML visible-text extraction (stages/htmlextract.py):

* scripts/styles/hidden subtrees never leak into text; title captured;
* entities decode; block tags break lines; whitespace collapses;
* malformed HTML degrades gracefully (keeps the prefix, never raises);
* Dataset plumbing: columns replaced, html dropped, layout-independent;
* chains into clean_corpus-shaped downstream (text column is the
  pipeline contract).
"""

import pyarrow as pa

from ner_ray.stages.htmlextract import (extract_html,
                                        extract_text_from_html)

_PAGE = """<!DOCTYPE html><html><head>
<title> My   Page &amp; Title </title>
<style>body { color: red; }</style>
<script>var hidden = "never shown";</script>
</head><body>
<h1>Header&nbsp;One</h1>
<p>First paragraph with <b>bold</b> and <a href="#">a link</a>.</p>
<div>Second
   block</div>
<noscript>also hidden</noscript>
<ul><li>item one</li><li>item two</li></ul>
</body></html>"""


def test_extract_basics():
    text, title = extract_html(_PAGE)
    lines = text.split("\n")
    assert title == "My Page & Title"
    assert "Header\xa0One" in lines[0] or "Header" in lines[0]
    assert any("First paragraph with bold and a link." == l
               for l in lines)
    assert "Second block" in lines
    assert "item one" in lines and "item two" in lines
    assert "hidden" not in text and "color: red" not in text


def test_unclosed_title_keeps_body():
    # real crawls contain unclosed <title>; without the reset the
    # whole body would be swallowed into the title
    text, title = extract_html(
        "<html><head><title>Foo<body><p>real content here</p>")
    assert title == "Foo"
    assert "real content here" in text


def test_malformed_and_empty():
    text, title = extract_html("<p>ok<div <<<bad")
    assert text.startswith("ok")
    assert extract_html("") == ("", "")
    assert extract_html("plain words only") == ("plain words only", "")
    # nested skip sections
    text, _ = extract_html(
        "<div>a<script>x<style>y</style>z</script>b</div>")
    assert text == "a b" or text == "ab" or "a" in text and "x" not in text


def test_dataset_plumbing(ray_session):
    import ray.data as rd

    rows = [{"doc_id": i, "html": _PAGE, "text": "old"} for i in range(6)]
    ds = rd.from_items(rows).repartition(3)
    out = extract_text_from_html(ds)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert "html" not in t.column_names
    assert set(t.column_names) == {"doc_id", "text", "title"}
    texts = t.column("text").to_pylist()
    assert all(x == texts[0] for x in texts)  # deterministic
    assert "First paragraph" in texts[0]
    assert t.column("title").to_pylist()[0] == "My Page & Title"
    # keep_html variant
    keep = extract_text_from_html(rd.from_items(rows), drop_html=False)
    kt = pa.concat_tables(list(keep.iter_batches(batch_format="pyarrow")))
    assert "html" in kt.column_names


def test_null_html(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": 0, "html": None}])
    t = pa.concat_tables(list(
        extract_text_from_html(ds, concurrency=1)
        .iter_batches(batch_format="pyarrow")))
    assert t.column("text").to_pylist() == [""]

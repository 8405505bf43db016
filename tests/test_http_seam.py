"""The ingestion transport seam, proven with a mocked fetcher: the S1 bulk
and S2 per-key sources accept an injected transport and replay the
reference's pull protocol (one GET per endpoint, politeness delay between a
worker's consecutive pulls — includes.py:77-86) without any live HTTP.
Reader-level tests drive partitions()/read() directly; an end-to-end test
runs the S2 source through spark.read to prove the executor-side plumbing
(options, pickling, flatten) with the same code path.
"""

from __future__ import annotations

import json

from fpl_data_pipeline_spark.sources.python_datasource import (
    BootstrapReader,
    ElementSummaryReader,
    register_element_summary_source,
)


class FakeTransport:
    """Records every URL fetched and serves canned documents."""

    def __init__(self, docs: dict):
        self.docs = docs
        self.urls: list[str] = []

    def __call__(self, url: str) -> dict:
        self.urls.append(url)
        return self.docs[url]


def _bootstrap_doc(n: int) -> dict:
    return {
        "elements": [
            {
                "id": i,
                "first_name": f"fn{i}",
                "second_name": f"sn{i}",
                "form": "1.5",
                "total_points": 10 * i,
                "now_cost": 50 + i,
                "team": i % 5,
                "element_type": 1 + i % 4,
            }
            for i in range(1, n + 1)
        ]
    }


def _summary_doc(pid: int, weeks: int = 2) -> dict:
    return {
        "history": [
            {
                "element": pid,
                "fixture": 100 * pid + w,
                "round": w,
                "total_points": pid + w,
                "minutes": 90,
                "value": 50,
            }
            for w in range(1, weeks + 1)
        ]
    }


def test_bootstrap_reader_over_mocked_http():
    """S1 bulk source against an https:// URL: every element delivered
    exactly once across shards, all bytes via the injected transport."""
    url = "https://example.test/api/bootstrap-static/"
    transport = FakeTransport({url: _bootstrap_doc(11)})
    reader = BootstrapReader({"path": url}, fetch=transport)
    rows = [r for p in reader.partitions() for r in reader.read(p)]
    assert sorted(r[0] for r in rows) == list(range(1, 12))
    assert len(rows) == 11
    # one bulk-document fetch per shard, always the configured endpoint
    assert set(transport.urls) == {url}
    assert len(transport.urls) == len(reader.partitions())
    # row shape matches the declared schema order
    assert rows[0][1].startswith("fn") and rows[0][2].startswith("sn")


def test_element_summary_reader_fans_out_per_key_with_politeness():
    """S2 per-key source: one fetch per player id (exactly once, sharded),
    history[] flattened, and the reference's politeness delay observed
    between each worker's consecutive fetches."""
    tmpl = "https://example.test/api/element-summary/{id}/"
    n = 7
    transport = FakeTransport({tmpl.format(id=i): _summary_doc(i) for i in range(1, n + 1)})
    sleeps: list[float] = []
    reader = ElementSummaryReader(
        {"url_template": tmpl, "num_players": str(n), "shards": "3"},
        fetch=transport,
        sleep=sleeps.append,
    )
    parts = reader.partitions()
    per_shard_fetches = []
    rows = []
    for p in parts:
        before = len(transport.urls)
        rows.extend(reader.read(p))
        per_shard_fetches.append(len(transport.urls) - before)
    # every id fetched exactly once, with the exact reference URL shape
    assert sorted(transport.urls) == sorted(tmpl.format(id=i) for i in range(1, n + 1))
    # two history rows per player, element column carries the player id
    assert len(rows) == 2 * n
    assert sorted({r[0] for r in rows}) == list(range(1, n + 1))
    # politeness: a worker doing k fetches sleeps k-1 times, 0.2 s each
    assert len(sleeps) == sum(k - 1 for k in per_shard_fetches if k > 0)
    assert all(s == 0.2 for s in sleeps)


def test_element_summary_source_end_to_end_file_template(spark, tmp_path):
    """The same S2 source through spark.read with a landed-file template:
    proves option parsing, reader pickling, and the executor-side flatten."""
    for pid in range(1, 6):
        (tmp_path / f"{pid}.json").write_text(json.dumps(_summary_doc(pid, weeks=3)))
    register_element_summary_source(spark)
    df = (
        spark.read.format("fpl_element_summary")
        .option("url_template", f"{tmp_path}/{{id}}.json")
        .option("num_players", 5)
        .option("politeness_s", 0.0)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 15
    assert sorted({r.element for r in rows}) == [1, 2, 3, 4, 5]
    assert {r["round"] for r in rows} == {1, 2, 3}

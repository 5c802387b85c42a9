"""spark-submit CLI (op 26): the streaming attach/rebuild subcommands wire
the incremental paths end-to-end from argv (in-process — `_session` joins
the pytest session via getOrCreate)."""

import json

from lsh_hdc_spark.cli import main
from lsh_hdc_spark.sources.clips import synth_clips


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_attach_then_rebuild_fused(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    synth_clips(spark, 24, seed=42).write.parquet(src)
    ix = str(tmp_path / "ix")
    main(
        [
            "attach", "--mode", "fused",
            "--source", src, "--index", ix,
            "--checkpoint", str(tmp_path / "ck"),
        ]
    )
    out = _last_json(capsys)
    assert out["labeled_rows"] == 24
    main(["rebuild", "--mode", "fused", "--index", ix])
    out = _last_json(capsys)
    assert out["labeled_rows"] == 24
    # labels are the canonical clustering after rebuild: families of 4
    # (ids < 16 at n=24) rooted at their min member, singletons themselves
    got = {
        r.clip_id: r.cluster_id
        for r in spark.read.parquet(f"{ix}/labels").collect()
    }
    for cid, label in got.items():
        i = int(cid[4:])
        root = (i // 4) * 4 if i < 16 else i
        assert label == f"clip{root:08d}", cid

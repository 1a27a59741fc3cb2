"""PipelineConfig / stage-registry tests (§2.10 user-extension seat)."""

import pytest

from kb_ner_ray.pipelines.config import (
    PipelineConfig, StageConfig, build_pipeline, register, run_pipeline)


@pytest.fixture(scope="module")
def corpus_dir_small(tmp_path_factory, tiny_corpus):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cfg_corpus")
    for name in ("pages", "kb", "gazetteer"):
        (d / name).mkdir()
        pq.write_table(tiny_corpus[name], str(d / name / "part0.parquet"))
    return str(d)


def test_yaml_round_trip(tmp_path, corpus_dir_small):
    y = tmp_path / "p.yaml"
    y.write_text(f"""
input: {corpus_dir_small}/pages
corpus: {corpus_dir_small}
stages:
  - name: extract
  - name: explode
  - name: filter_length
    params: {{max_tokens: 510}}
output:
""", encoding="utf-8")
    cfg = PipelineConfig.from_yaml(str(y))
    assert [s.name for s in cfg.stages] == ["extract", "explode",
                                            "filter_length"]
    assert cfg.stages[2].params == {"max_tokens": 510}


def test_config_pipeline_matches_kg(ray_session, corpus_dir_small):
    from kb_ner_ray.pipelines.kg import kg_triples

    cfg = PipelineConfig(
        input_path=corpus_dir_small + "/pages",
        corpus=corpus_dir_small,
        stages=[StageConfig("extract"), StageConfig("explode"),
                StageConfig("triples"), StageConfig("canonicalize")],
    )
    n_cfg = run_pipeline(cfg)
    n_kg = kg_triples(corpus_dir_small).count()
    assert n_cfg == n_kg > 0


def test_unknown_stage_raises(corpus_dir_small):
    cfg = PipelineConfig(input_path=corpus_dir_small + "/pages",
                         stages=[StageConfig("nope")])
    with pytest.raises(KeyError, match="unknown stage"):
        build_pipeline(cfg)


def test_register_custom_stage(ray_session, corpus_dir_small):
    @register("take3")
    def _take3(ds, ctx, **_):
        return ds.limit(3)

    cfg = PipelineConfig(input_path=corpus_dir_small + "/pages",
                         stages=[StageConfig("take3")])
    assert build_pipeline(cfg).count() == 3

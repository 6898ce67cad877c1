"""Fused kernel ≡ declarative pipeline (per-row equality on every output
the two paths share)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_notes_ingestion_spark.operators.extract import extract_pages
from osm_notes_ingestion_spark.operators.fused import fused_extract_assign
from osm_notes_ingestion_spark.operators.spatial_join import assign_countries
from osm_notes_ingestion_spark.sources.polygons import prep_polygons
from osm_notes_ingestion_spark.sources.synth import pages_df, world_polygons


@pytest.mark.parametrize("level", [6, 9])
def test_fused_equals_declarative(spark, sf_dir, level):
    pages = pages_df(spark, sf_dir)
    index = prep_polygons(world_polygons(), level=level)

    decl = (
        assign_countries(spark, extract_pages(pages), index)
        .select("id", "country_id", "n_candidates")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    fused = (
        fused_extract_assign(spark, pages, index)
        .select("id", "country_id", "n_candidates", "text", "has_coords")
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert (decl.index == fused.index).all()
    pd.testing.assert_series_equal(
        decl["country_id"].astype("Float64"),
        fused["country_id"].astype("Float64"),
        check_names=False,
    )
    assert (decl["n_candidates"].to_numpy() == fused["n_candidates"].to_numpy()).all()

    # text parity with the extraction operator too
    ext = (
        extract_pages(pages).select("id", "text").toPandas().set_index("id").sort_index()
    )
    assert (ext["text"].fillna("∅") == fused["text"].fillna("∅")).all()

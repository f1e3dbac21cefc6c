import os

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env={"env_vars": {"PYTHONPATH": "/root/repo"},
                     "worker_process_setup_hook":
                     "docling_translate_ray.util.warm_imports"},
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # 2 blocks/CPU read floor (vs Ray's 200) — see bench.py; the 4-CPU
    # test session otherwise splits every small read into 200 blocks
    ctx.read_op_min_num_blocks = 8
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def pages_table():
    from docling_translate_ray.corpus import gen_pages

    return gen_pages(200, seed=42)


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory, pages_table):
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pages")
    pq.write_table(pages_table, d / "pages.parquet")
    return str(d)


@pytest.fixture(scope="session")
def docs_text_table():
    from docling_translate_ray.corpus import gen_docs_text

    return gen_docs_text(120, seed=43)

from txtlogparser_spark.sources.fixtures import (  # noqa: F401
    FixtureSpec,
    build_vocab,
    generate_sequences,
    generate_source_info,
    default_workspace,
    write_fixture_tables,
)

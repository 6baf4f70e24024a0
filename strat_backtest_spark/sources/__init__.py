from strat_backtest_spark.sources.bars import (  # noqa: F401
    load_bars_csv,
    load_bars_parquet,
    load_testdata,
    write_bars_csv,
    write_bars_parquet,
)
from strat_backtest_spark.sources.symbols import load_symbols, load_stopwords  # noqa: F401
from strat_backtest_spark.sources.yahoo import (  # noqa: F401
    download_bars,
    market_benchmark,
    ticker_history,
)

"""CLI logging reaches stdout and OUTPUT_DIR/log.txt even with absl handlers.

Regression: jax/absl install a root handler at import time, which made
logging.basicConfig a no-op — the shipped CLIs dropped every INFO line
(iteration logs, eval CSV results) into the void.
"""

import logging


def test_setup_logger_emits_info_despite_root_handler(tmp_path, capsys):
    root = logging.getLogger()
    extra = logging.StreamHandler()  # simulate absl's pre-installed handler
    root.addHandler(extra)
    try:
        from unit_tpu.engine.runner import setup_logger

        lg = setup_logger(str(tmp_path))
        lg.info("csv: bbox,AP50,42.0")
        out = capsys.readouterr().out
        assert "csv: bbox,AP50,42.0" in out
        assert "csv: bbox,AP50,42.0" in (tmp_path / "log.txt").read_text()
        # idempotent: no duplicate handlers on repeated setup
        n = len(lg.handlers)
        setup_logger(str(tmp_path))
        assert len(lg.handlers) == n
    finally:
        root.removeHandler(extra)

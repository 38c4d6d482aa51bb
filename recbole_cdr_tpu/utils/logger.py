"""Colored console + file logging (capability parity with recbole's ``init_logger``)."""

import logging
import os
import sys
from datetime import datetime

_COLORS = {
    "black": "30", "red": "31", "green": "32", "yellow": "33",
    "blue": "34", "pink": "35", "cyan": "36", "white": "37",
}


def set_color(text: str, color: str, highlight: bool = True) -> str:
    code = _COLORS.get(color, "37")
    prefix = "1;" if highlight else ""
    return f"\033[{prefix}{code}m{text}\033[0m"


def ensure_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def init_logger(config) -> logging.Logger:
    """Initialise root logger with console + logfile handlers.

    ``config['state']`` controls the console level (INFO/DEBUG/WARNING/ERROR/CRITICAL).
    """
    log_root = config["log_dir"] if config["log_dir"] else "./log"
    model_name = config["model"] or "model"
    ensure_dir(os.path.join(log_root, model_name))
    logfile = os.path.join(
        log_root, model_name,
        f"{model_name}-{datetime.now().strftime('%b-%d-%Y_%H-%M-%S')}.log",
    )

    state = (config["state"] or "INFO").upper()
    level = getattr(logging, state, logging.INFO)

    root = logging.getLogger()
    root.setLevel(min(level, logging.INFO))
    for h in list(root.handlers):
        root.removeHandler(h)

    fmt = logging.Formatter("%(asctime)-15s %(levelname)s  %(message)s", "%a %d %b %Y %H:%M:%S")
    fh = logging.FileHandler(logfile)
    fh.setLevel(logging.INFO)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setLevel(level)
    sh.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(sh)
    return root

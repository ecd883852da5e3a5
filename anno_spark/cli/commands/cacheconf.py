"""`cache` and `config` — local state management.

Ports of anno/src/cli/commands/cache.rs:40-161 and config.rs:61-167.
Directories follow the reference's dirs-crate fallbacks (utils.rs:663-702):
``$XDG_CACHE_HOME/anno_spark`` / ``$XDG_CONFIG_HOME/anno_spark``, else
``~/.cache`` / ``~/.config``, else the in-tree dotted fallbacks.  Configs
are stored as JSON (the engine has no toml writer in its dependency set;
layout/keys match the reference's).
"""

from __future__ import annotations

import json
import os
import time

from ..errors import CliError
from ..output import color, format_size


def cache_dir() -> str:
    """utils.rs:663-681."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    try:
        path = os.path.join(base, "anno_spark")
        os.makedirs(path, exist_ok=True)
        return path
    except OSError:
        return ".anno-cache"


def config_dir() -> str:
    """utils.rs:684-702."""
    base = os.environ.get("XDG_CONFIG_HOME") or os.path.join(
        os.path.expanduser("~"), ".config"
    )
    try:
        path = os.path.join(base, "anno_spark")
        os.makedirs(path, exist_ok=True)
        return path
    except OSError:
        return ".anno-config"


# ---------------------------------------------------------------------------
# cache (cache.rs:40-161)
# ---------------------------------------------------------------------------


def run_cache(args):
    d = args.cache_dir or cache_dir()
    action = args.action

    if action == "list":
        if not os.path.isdir(d):
            print(f"Cache directory does not exist: {d}")
            return
        files = sorted(
            (f for f in os.listdir(d) if os.path.isfile(os.path.join(d, f))),
            key=lambda f: os.path.getmtime(os.path.join(d, f)),
        )
        print(f"Cached results ({len(files)} files):")
        for name in files:
            path = os.path.join(d, name)
            size = os.path.getsize(path)
            modified = time.strftime(
                "%Y-%m-%d %H:%M:%S", time.gmtime(os.path.getmtime(path))
            )
            print(f"  {name} ({format_size(size)}) - {modified}")
    elif action == "clear":
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
            print(f"{color('32', 'ok:')} Cache cleared")
        else:
            print("Cache directory does not exist")
    elif action == "stats":
        if not os.path.isdir(d):
            print("Cache directory does not exist")
            return
        names = os.listdir(d)
        total = sum(
            os.path.getsize(os.path.join(d, n))
            for n in names
            if os.path.isfile(os.path.join(d, n))
        )
        print("Cache Statistics:")
        print(f"  Files: {len(names)}")
        print(f"  Total size: {format_size(total)}")
    else:  # invalidate
        if not os.path.isdir(d):
            print("Cache directory does not exist")
            return
        removed = 0
        for name in os.listdir(d):
            if args.model and name.startswith(f"{args.model}-"):
                should = True
            elif args.file and args.file in name:
                should = True
            else:
                should = False
            if should:
                try:
                    os.remove(os.path.join(d, name))
                    removed += 1
                except OSError:
                    pass
        print(f"{color('32', 'ok:')} Removed {removed} cache entries")


# ---------------------------------------------------------------------------
# config (config.rs:61-167)
# ---------------------------------------------------------------------------


def run_config(args):
    d = args.config_dir or config_dir()
    action = args.action

    if action == "save":
        config: dict = {}
        if args.model:
            config["model"] = args.model
        if args.coref:
            config["coref"] = True
        if args.link_kb:
            config["link_kb"] = True
        if args.threshold is not None:
            config["threshold"] = args.threshold
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{args.name}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(config, f, indent=2)
        print(f"{color('32', 'ok:')} Saved config: {args.name}")
    elif action == "list":
        if not os.path.isdir(d):
            print("No configs found")
            return
        configs = sorted(
            os.path.splitext(n)[0] for n in os.listdir(d) if n.endswith(".json")
        )
        if not configs:
            print("No configs found")
        else:
            print("Saved configs:")
            for c in configs:
                print(f"  {c}")
    elif action == "show":
        path = os.path.join(d, f"{args.name}.json")
        if not os.path.isfile(path):
            raise CliError(f"Config '{args.name}' not found")
        with open(path, encoding="utf-8") as f:
            print(f"Config: {args.name}")
            print(f.read())
    else:  # delete
        path = os.path.join(d, f"{args.name}.json")
        if not os.path.isfile(path):
            raise CliError(f"Config '{args.name}' not found")
        os.remove(path)
        print(f"{color('32', 'ok:')} Deleted config: {args.name}")

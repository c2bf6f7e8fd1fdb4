"""Conf-template generator (plays the role of ``python3 -m
moduleconf.generate`` in the reference workflow):

    python -m transkun_tpu.cli.gen_conf transkun_tpu.models.transkun > model.conf
"""

import argparse
import importlib
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "module", nargs="?", default="transkun_tpu.models.transkun",
        help="model module exposing Config (default: the V2 transformer)",
    )
    args = parser.parse_args(argv)

    module = importlib.import_module(args.module)
    conf = module.Config()
    d = conf.to_dict() if hasattr(conf, "to_dict") else dict(conf.__dict__)
    json.dump(
        {
            "Model": {
                "module": args.module,
                "configClassName": "Config",
                "config": d,
            }
        },
        sys.stdout,
        indent=2,
    )
    print()


if __name__ == "__main__":
    main()

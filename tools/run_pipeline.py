"""spark-submit application wrapper: the file argument spark-submit
requires (it takes a script path, not -m), delegating to the package
CLI shipped via --py-files.  See tools/submit_smoke.sh for the
end-to-end deployment smoke run."""

from corhist_spark.cli import main

if __name__ == "__main__":
    main()

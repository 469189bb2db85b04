

class TestContaminationMatrix:
    def test_matches_model(self, spark):
        from collections import defaultdict

        from txtlogparser_spark.operators.decontaminate import (
            contamination_matrix,
        )

        train_rows = [
            (0, "s0", "a b c d e"),
            (1, "s0", "x y z w v"),
            (2, "s1", "a b c q r"),
            (3, "s1", "m n o p q"),
        ]
        eval_rows = [
            (100, "t0", "a b c"),      # hits docs 0 and 2
            (101, "t1", "n o p"),      # hits doc 3
            (102, "t1", "b c d"),      # hits doc 0
        ]
        train = spark.createDataFrame(
            train_rows, ["doc_id", "source", "text"]
        )
        ev = spark.createDataFrame(eval_rows, ["eid", "task", "text"])
        got = {
            (r["source"], r["task"]): (r["n_hit_docs"], r["n_hit_grams"])
            for r in contamination_matrix(train, ev, n=3).collect()
        }

        def shingles(t):
            ws = t.split()
            return {
                " ".join(ws[i:i + 3]) for i in range(len(ws) - 2)
            }

        ev_sets = defaultdict(set)
        for _e, task, t in eval_rows:
            ev_sets[task] |= shingles(t)
        want = defaultdict(lambda: [set(), 0])
        for did, src, t in train_rows:
            for task, grams in ev_sets.items():
                hit = shingles(t) & grams
                if hit:
                    want[(src, task)][0].add(did)
                    want[(src, task)][1] += len(hit)
        assert got == {
            k: (len(v[0]), v[1]) for k, v in want.items()
        }

    def test_eval_side_broadcasts(self, spark):
        from txtlogparser_spark.operators.decontaminate import (
            contamination_matrix,
        )

        train = spark.createDataFrame(
            [(0, "s0", "a b c d")], ["doc_id", "source", "text"]
        )
        ev = spark.createDataFrame(
            [(1, "t0", "a b c")], ["eid", "task", "text"]
        )
        plan = (
            contamination_matrix(train, ev, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

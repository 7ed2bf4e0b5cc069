"""MME image task + still-image adapter path vs reference semantics
(lmms_eval/tasks/mme/utils.py, mme.yaml)."""

import os

import numpy as np
import pytest

from videoitg_tpu.eval.api import get_adapter, get_task
from videoitg_tpu.eval.harness import evaluate_task
from videoitg_tpu.eval.tasks.mme import parse_pred_ans


def test_parse_pred_ans_otter_rules():
    # utils.py:52-73
    assert parse_pred_ans("Yes.") == "yes"
    assert parse_pred_ans(" no ") == "no"
    assert parse_pred_ans("Y") == "yes"
    assert parse_pred_ans("n") == "no"
    assert parse_pred_ans("x") == "other"
    assert parse_pred_ans("Yes, the image shows a cat") == "yes"
    assert parse_pred_ans("No, it does not") == "no"
    # only the first 4 chars count for the prefix rule
    assert parse_pred_ans("maybe yes") == "other"
    assert parse_pred_ans("") == "other"


def test_doc_to_text_strips_embedded_instruction():
    t = get_task("mme")
    doc = {"question": "Is there a dog? Please answer yes or no.",
           "question_id": "img1", "answer": "Yes", "category": "existence"}
    # default kwargs (mme.yaml:28-31) replace the embedded suffix
    text = t.doc_to_text(doc)
    assert "Please answer yes or no." not in text
    assert text == ("Is there a dog?\n"
                    "Answer the question using a single word or phrase.")
    # empty overrides keep the raw question (utils.py:43-48 only rewrites
    # when a pre/post prompt is configured)
    assert (t.doc_to_text(doc, pre_prompt="", post_prompt="")
            == "Is there a dog? Please answer yes or no.")


def _pair(qid, cat, s1, s2):
    t = get_task("mme")
    d1 = {"question_id": qid, "category": cat, "answer": "Yes",
          "question": "q"}
    d2 = {"question_id": qid, "category": cat, "answer": "No",
          "question": "q"}
    return [t.process_results(d1, "yes" if s1 else "no"),
            t.process_results(d2, "no" if s2 else "yes")]


def test_pairwise_aggregation_math():
    """acc + acc_plus per image, category mean, perception/cognition sums
    (utils.py:104-126)."""
    t = get_task("mme")
    recs = (_pair("a", "existence", True, True)      # acc 100 + plus 100
            + _pair("b", "existence", True, False)   # acc 50 + plus 0
            + _pair("c", "count", False, False)      # acc 0 + plus 0
            + _pair("d", "code_reasoning", True, True))
    agg = t.aggregate(recs)
    assert agg["mme_existence"] == pytest.approx((200.0 + 50.0) / 2)
    assert agg["mme_count"] == 0.0
    assert agg["mme_code_reasoning"] == 200.0
    assert agg["mme_perception_score"] == pytest.approx(125.0 + 0.0)
    assert agg["mme_cognition_score"] == 200.0


def test_non_pairwise_asserts():
    t = get_task("mme")
    recs = _pair("a", "existence", True, True)[:1]
    with pytest.raises(AssertionError, match="pairwise"):
        t.aggregate(recs)


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mme_root")
    os.makedirs(root / "images")
    rng = np.random.default_rng(0)
    for name in ("img0.jpg", "img1.png"):
        arr = rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "images" / name)
    return str(root)


def _docs():
    out = []
    for i in range(2):
        ext = "jpg" if i == 0 else "png"
        for answer in ("Yes", "No"):
            out.append({
                "question_id": f"img{i}", "category": "existence",
                "image": f"images/img{i}.{ext}",
                "question": f"Is it {answer}? Please answer yes or no.",
                "answer": answer,
            })
    return out


def test_image_adapter_end_to_end(image_root, tmp_path):
    """Stills flow through the downstream family as 1-frame videos."""
    task = get_task("mme")
    adapter = get_adapter("echo-answer")(answer_letter="Yes", num_frame=4,
                                         data_root=image_root)
    rep = evaluate_task(adapter, task, _docs(),
                        str(tmp_path / "out"), log_samples=True)
    assert rep.num_docs == 4
    # echo always says yes: each pair scores acc 50 + plus 0
    assert rep.metrics["mme_perception_score"] == pytest.approx(50.0)
    assert rep.metrics["mme_cognition_score"] == 0.0
    assert adapter.last_metadata["video_backend"] == "pil"
    assert adapter.last_metadata["total_num_frames"] == 1


def test_pope_metrics_confusion_math():
    """Precision/recall/F1 over the yes-class; yes_ratio counts GOLD yes
    (utils.py:36-96)."""
    t = get_task("pope")

    def rec(gt, pred):
        return t.process_results(
            {"question_id": "q", "answer": gt, "category": "adversarial"},
            pred)

    recs = [rec("yes", "yes"), rec("yes", "no"),     # tp, fn
            rec("no", "yes"), rec("no", "no")]       # fp, tn
    agg = t.aggregate(recs)
    assert agg["pope_accuracy"] == 0.5
    assert agg["pope_precision"] == 0.5   # tp=1 / (tp+fp=2)
    assert agg["pope_recall"] == 0.5      # tp=1 / (tp+fn=2)
    assert agg["pope_f1_score"] == 0.5
    assert agg["pope_yes_ratio"] == 0.5   # 2 gold-yes of 4
    # prediction is a bare lower/strip compare — "Yes." does NOT match
    assert rec("yes", "Yes.")["score"] == 0.0
    assert rec("yes", " Yes ")["score"] == 1.0


def test_pope_split_variants_filter_category(tmp_path):
    import json

    docs = [{"question_id": f"q{i}", "answer": "yes", "category": c,
             "question": "?", "image": "x.png"}
            for i, c in enumerate(["adversarial", "popular", "random",
                                   "adversarial"])]
    (tmp_path / "test.json").write_text(json.dumps(docs))
    assert len(get_task("pope").load_docs(str(tmp_path), "test")) == 4
    adv = get_task("pope_adv").load_docs(str(tmp_path), "test")
    assert [d["question_id"] for d in adv] == ["q0", "q3"]
    assert len(get_task("pope_pop").load_docs(str(tmp_path), "test")) == 1


def test_realworldqa_filter_choice_text_to_letter():
    from videoitg_tpu.eval.filters import build_filter_ensemble

    ens = build_filter_ensemble("flexible-extract",
                                [("realworldqa_extract", None)])
    doc = {"question": ("How many lanes?\nA. two lanes\nB. four lanes\n"
                        "C. six lanes")}
    # choice text (punctuation-stripped) maps back to its letter
    assert ens.apply([["I think it's four lanes."]], [doc]) == [["B"]]
    # number words map to digits before matching
    assert ens.apply([["four"]], [doc]) == [["4"]]
    # no choice hit: cleaned response passes through
    assert ens.apply([["a green car!"]], [doc]) == [["a green car"]]
    # no embedded choices at all: cleaned response survives
    assert ens.apply([["42."]], [{"question": "How many?"}]) == [["42"]]


def test_realworldqa_scoring_and_prompt():
    t = get_task("realworldqa")
    doc = {"question": "How many lanes?\nA. 2\nB. 4", "answer": "B",
           "image": "x.png"}
    assert t.doc_to_text(doc) == "How many lanes?\nA. 2\nB. 4"
    r = t.process_results(doc, "B")
    assert r["exact_match"] == 1.0
    assert t.process_results(doc, "b.")["exact_match"] == 1.0
    assert t.process_results(doc, "4")["exact_match"] == 0.0
    agg = t.aggregate([r, t.process_results(doc, "A")])
    assert agg["realworldqa_exact_match"] == 50.0


def test_mmstar_matcher_rules():
    from videoitg_tpu.eval.tasks.mmstar import exact_match

    # utils.py:40-55
    assert exact_match("B", "B") == 1.0
    assert exact_match("b.", "B") == 1.0        # first char
    assert exact_match("(C) something", "C") == 1.0
    assert exact_match("option d", "D") == 1.0
    assert exact_match("The answer is A", "A") == 1.0
    assert exact_match("Sure: B", "B") == 0.0   # first char only
    assert exact_match("", "A") == 0.0          # empty -> except -> 0


def test_mmstar_l2_grouped_aggregation():
    t = get_task("mmstar")

    def rec(idx, cat, l2, score):
        return t.process_results(
            {"index": idx, "category": cat, "l2_category": l2,
             "answer": "A"}, "A" if score else "B")

    recs = [rec(0, "math", "geometry", 1),
            rec(1, "math", "geometry", 1),
            rec(2, "math", "geometry", 1),
            rec(3, "math", "statistical reasoning", 0)]
    agg = t.aggregate(recs)
    # l2 means weigh equally: (1.0 + 0.0) / 2, not 3/4
    assert agg["mmstar_math"] == pytest.approx(0.5)
    assert agg["mmstar_average"] == pytest.approx(0.5)
    assert "mmstar_coarse perception" not in agg  # absent category omitted


def test_ai2d_prompt_formats_and_targets():
    t = get_task("ai2d")
    doc = {"question": "Which is the stem?", "options": ["leaf", "stem"],
           "answer": "1", "image": "x.png"}
    text = t.doc_to_text(doc)
    assert "A. leaf\nB. stem" in text
    assert text.endswith(
        "Answer with the option's letter from the given choices directly.")
    # qa format: bare choice texts, no separator after the question
    # (utils.py:16-18 byte behavior)
    qa = t.doc_to_text(doc, prompt_format="qa", post_prompt=" Answer:")
    assert qa == "Which is the stem?leaf\nstem Answer:"
    assert t.doc_to_target(doc) == "B"
    assert t.doc_to_target(doc, target_format="qa") == "stem"


def test_ai2d_filter_and_scoring():
    from videoitg_tpu.eval.filters import build_filter_ensemble

    ens = build_filter_ensemble("flexible-extract", [("ai2d_letter", None)])
    assert ens.apply([["B. stem"]], [{}]) == [["B"]]
    assert ens.apply([[" A. leaf because..."]], [{}]) == [["A"]]
    assert ens.apply([["the stem"]], [{}]) == [["the stem"]]  # pass-through

    t = get_task("ai2d")
    doc = {"question": "q", "options": ["leaf", "stem"], "answer": "1",
           "image": "x.png"}
    assert t.process_results(doc, "B")["exact_match"] == 1.0
    assert t.process_results(doc, "b.")["exact_match"] == 1.0  # ignore case/punct
    assert t.process_results(doc, "A")["exact_match"] == 0.0
    agg = t.aggregate([t.process_results(doc, "B"),
                       t.process_results(doc, "A")])
    assert agg["ai2d_exact_match"] == 50.0


def test_seedbench_prompt_scoring_and_rollups():
    t = get_task("seedbench")
    doc = {"question_id": "q1", "question": "What is shown?",
           "choice_a": "cat", "choice_b": "dog", "choice_c": "car",
           "choice_d": "sky", "answer": "B", "data_type": "image",
           "image": ["x.png"]}
    text = t.doc_to_text(doc)
    assert "A. cat\nB. dog\nC. car\nD. sky" in text
    # first char of a longer response (utils.py:19-20)
    assert t.process_results(doc, "B. dog")["correct"] == 1.0
    assert t.process_results(doc, " b ")["correct"] == 1.0
    assert t.process_results(doc, "dog")["correct"] == 0.0  # 'd' != 'b'
    vid = {**doc, "question_id": "q2", "data_type": "video", "answer": "A"}
    agg = t.aggregate([t.process_results(doc, "B"),
                       t.process_results(vid, "C")])
    assert agg["seed_image"] == 1.0
    assert agg["seed_video"] == 0.0
    assert agg["seed_all"] == 0.5


def test_seedbench_ppl_expansion():
    import videoitg_tpu.eval.tasks.seedbench as sb

    docs = sb.ll_expand_docs([{
        "question_id": "q", "question": "Q?", "choice_a": "x",
        "choice_b": "yy", "choice_c": "z", "choice_d": "w",
        "answer": "B", "data_type": "image", "image": ["i.png"]}])
    assert len(docs) == 4 and docs[1]["_ll_id"] == "q::1"
    assert sb.ll_doc_to_target(docs[1]) == " yy"
    assert sb.ll_doc_to_text(docs[0]) == "Q? Answer :"
    recs = [sb.ll_process_results(d, (-float(i + 1), False))
            for i, d in enumerate(docs)]
    # option 0 has the highest ll but gold is 1
    assert sb.ll_aggregate(recs)["seedbench_ll_acc"] == 0.0


def test_seedbench_multi_image_visual(image_root):
    t = get_task("seedbench")
    doc = {"question_id": "q", "question": "?", "choice_a": "a",
           "choice_b": "b", "choice_c": "c", "choice_d": "d",
           "answer": "A", "data_type": "video",
           "image": ["images/img0.jpg", "images/img1.png"]}
    visual = t.doc_to_visual(doc, image_root)
    assert isinstance(visual, list) and len(visual) == 2
    adapter = get_adapter("echo-answer")(num_frame=8, data_root=image_root)
    frames, ids = adapter.frames_for_doc("q", visual)
    # both stills share (40, 56); the stack keeps them
    assert frames.shape == (2, 40, 56, 3) and ids == [0, 1]
    # single-image docs resolve to a bare path (plain still branch)
    doc1 = {**doc, "image": ["images/img1.png"]}
    assert isinstance(t.doc_to_visual(doc1, image_root), str)


def test_multi_image_mixed_sizes_resize_to_first(image_root, tmp_path):
    from PIL import Image

    big = tmp_path / "big.png"
    Image.fromarray(np.zeros((64, 80, 3), dtype=np.uint8)).save(big)
    adapter = get_adapter("echo-answer")(num_frame=8, data_root=image_root)
    frames, ids = adapter.frames_for_doc(
        0, [os.path.join(image_root, "images", "img0.jpg"), str(big)])
    assert frames.shape == (2, 40, 56, 3)  # second resized to first's size
    assert adapter.last_metadata["total_num_frames"] == 2


def test_scienceqa_prompt_formats_and_scoring():
    t = get_task("scienceqa_img")
    doc = {"question": "Which force?", "hint": "Look at the diagram.",
           "choices": ["gravity", "friction"], "answer": 1,
           "image": "x.png"}
    text = t.doc_to_text(doc)
    assert text.startswith("Context: Look at the diagram.\nWhich force?")
    assert "A. gravity\nB. friction" in text
    nohint = t.doc_to_text({**doc, "hint": ""})
    assert nohint.startswith("Which force?")
    qwen = t.doc_to_text({**doc, "hint": ""}, format="qwen_vl")
    assert qwen == ("Context: N/A\nQuestion: Which force?\n"
                    "Options: A. gravity\nB. friction\nAnswer:")
    assert t.doc_to_target(doc) == "B"
    assert t.process_results(doc, "B")["exact_match"] == 1.0
    assert t.process_results(doc, " b ")["exact_match"] == 1.0
    # the reference's dead "B. text" branch scores 0 (utils.py:41-43,
    # isupper() after lower()) — replicated for score parity
    assert t.process_results(doc, "B. friction")["exact_match"] == 0.0
    assert t.process_results(doc, "A")["exact_match"] == 0.0


def test_chartqa_relaxed_correctness():
    """lmms_eval/tasks/chartqa/utils.py:25-64 relaxed accuracy."""
    from videoitg_tpu.eval.tasks.chartqa import relaxed_correctness

    assert relaxed_correctness("10.4", "10")            # 4% rel err
    assert not relaxed_correctness("10.6", "10")        # 6% rel err
    assert relaxed_correctness("52%", "0.52")           # percent normalize
    assert relaxed_correctness("0.52", "52%")
    assert relaxed_correctness("Red", "red")            # string branch
    assert not relaxed_correctness("reds", "red")
    # replicated quirk: gold "0" is falsy -> string comparison
    assert relaxed_correctness("0", "0")
    assert not relaxed_correctness("0.0", "0")          # string-unequal
    assert not relaxed_correctness("abc", "10")


def test_chartqa_rollups():
    t = get_task("chartqa")
    doc_h = {"question": "q", "answer": "10", "type": "human_test",
             "image": "i.jpg"}
    doc_a = {"question": "q", "answer": "red", "type": "augmented_test",
             "image": "i.jpg"}
    recs = [t.process_results(doc_h, "10.2"),   # 1
            t.process_results(doc_h, "20"),     # 0
            t.process_results(doc_a, "red")]    # 1
    agg = t.aggregate(recs)
    assert agg["chartqa_relaxed_overall"] == pytest.approx(2 / 3)
    assert agg["chartqa_relaxed_human_split"] == pytest.approx(0.5)
    assert agg["chartqa_relaxed_augmented_split"] == 1.0
    assert t.doc_to_text(doc_h).endswith("single word or phrase.")


def test_docvqa_anls_task():
    t = get_task("docvqa_val")
    doc = {"questionId": 7, "question": "what is the date?",
           "answers": ["12 May 1998", "12/05/1998"], "image": "i.jpg"}
    r = t.process_results(doc, "12 may 1998")
    assert r["anls"] == 1.0 and r["questionId"] == 7
    bad = t.process_results(doc, "unrelated")
    assert bad["anls"] == 0.0
    agg = t.aggregate([r, bad])
    assert agg["docvqa_anls"] == pytest.approx(0.5)
    # string-valued answers field normalizes to a singleton list
    assert t.process_results({"questionId": 8, "question": "q",
                              "answers": "yes", "image": "i.jpg"},
                             "yes")["anls"] == 1.0
    assert t.doc_id_key == "questionId"


def test_infovqa_shares_docvqa_template():
    t = get_task("infovqa_val")
    doc = {"questionId": 3, "question": "how many?", "answers": ["42"],
           "image": "i.jpg"}
    assert t.doc_to_text(doc).endswith("single word or phrase.")
    r = t.process_results(doc, "42")
    assert r["anls"] == 1.0
    # metric key is task-prefixed, unlike docvqa's
    assert t.aggregate([r]) == {"infovqa_anls": 1.0}
    assert t.doc_id_key == "questionId"
    # the qwen_vl prompt variant is a post_prompt override
    assert t.doc_to_text(doc, post_prompt=" Answer:").endswith(" Answer:")


def test_image_groups_registered():
    from videoitg_tpu.eval.api import GROUP_REGISTRY

    assert GROUP_REGISTRY["image_bench"] == ["ai2d", "chartqa", "docvqa_val",
                                             "gqa", "infovqa_val", "mme",
                                             "mmstar", "ocrbench", "pope",
                                             "realworldqa", "scienceqa_img",
                                             "seedbench", "textvqa_val"]
    assert GROUP_REGISTRY["pope_full"] == ["pope_adv", "pope_pop",
                                           "pope_random"]


def test_image_frames_shape(image_root):
    adapter = get_adapter("echo-answer")(num_frame=8, data_root=image_root)
    frames, ids = adapter.frames_for_doc(
        0, os.path.join(image_root, "images", "img0.jpg"))
    assert frames.shape == (1, 40, 56, 3) and frames.dtype == np.uint8
    assert ids == [0]


# --- TextVQA / GQA / OCRBench (round-4 batch 2) ------------------------------


def test_vqa_normalize_evalai_rules():
    """lmms_eval/tasks/_task_utils/vqa_eval_metric.py semantics."""
    from videoitg_tpu.eval.vqa_answer import vqa_normalize

    assert vqa_normalize("A dog.") == "dog"            # article + period
    assert vqa_normalize("Two") == "2"                 # number words
    assert vqa_normalize("isnt") == "isn't"            # contraction canon
    assert vqa_normalize("the  cat,") == "cat"         # comma via tokenize
    assert vqa_normalize("3.5") == "3.5"               # decimal period kept
    assert vqa_normalize("1,000") == "1000"            # digit comma strip
    assert vqa_normalize("dog's") == "dog 's"          # 's split
    # punctuation embedded in a word becomes a space; adjacent to a space
    # it is deleted (the original space survives the replace)
    assert vqa_normalize("semi;colon") == "semi colon"
    assert vqa_normalize("semi; colon") == "semi colon"
    assert vqa_normalize("yes;") == "yes"


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/lmms_eval/tasks/_task_utils/vqa_eval_metric.py"),
    reason="reference checkout not present")
def test_vqa_normalize_matches_reference_fuzz():
    """Randomized parity vs the vendored EvalAIAnswerProcessor (the same
    oracle pattern as the sacrebleu cross-check in test_metrics.py)."""
    import importlib.util
    import random
    import string

    spec = importlib.util.spec_from_file_location(
        "ref_vqa",
        "/root/reference/lmms_eval/tasks/_task_utils/vqa_eval_metric.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    from videoitg_tpu.eval.vqa_answer import vqa_normalize

    proc = ref.EvalAIAnswerProcessor()
    rng = random.Random(42)
    vocab = ["two", "dogs", "a", "the", "an", "isnt", "dont", "yall",
             "none", "1,000", "3.5", "it's", "somebody'd", "o'clock",
             "ten", "Yes."]
    alphabet = string.ascii_letters + "0123456789;/[]\"{}()=+\\_-><@`,?!. '"
    for _ in range(500):
        parts = []
        for _ in range(rng.randint(1, 8)):
            if rng.random() < 0.6:
                parts.append(rng.choice(vocab))
            else:
                parts.append("".join(rng.choice(alphabet)
                                     for _ in range(rng.randint(1, 7))))
        s = (" " if rng.random() < 0.5 else "").join(parts)
        assert proc(s) == vqa_normalize(s), repr(s)


def test_vqa_accuracy_leave_one_out():
    """textvqa/utils.py:19-36 — min(1, matches/3) averaged per annotator."""
    from videoitg_tpu.eval.vqa_answer import vqa_accuracy

    answers = ["cat"] * 3 + ["dog"] * 7
    # each "cat" annotator sees 2 other cats -> 2/3; each dog sees all
    # 3 -> min(1, 3/3) = 1.0
    acc = vqa_accuracy("cat", answers)
    assert acc == pytest.approx((3 * (2 / 3) + 7 * 1.0) / 10)
    assert vqa_accuracy("bird", answers) == 0.0
    # normalization applies to both sides
    assert vqa_accuracy("A cat.", ["cat"] * 10) == 1.0
    assert vqa_accuracy("x", []) == 0.0


def test_textvqa_task():
    t = get_task("textvqa_val")
    doc = {"question_id": 11, "question": "what does the sign say?",
           "answers": ["stop"] * 10, "image": "i.jpg",
           "ocr_tokens": ["STOP"]}
    # prompt: capitalized question + default suffix (utils.py:47-59)
    assert t.doc_to_text(doc) == ("What does the sign say?\n"
                                  "Answer the question using a single word "
                                  "or phrase.")
    # ocr variant injects the token line before the post prompt
    assert "Reference OCR token: STOP" in t.doc_to_text(doc, ocr=True)
    r = t.process_results(doc, "Stop.")
    assert r["exact_match"] == 1.0 and r["pred"] == "stop"
    assert t.aggregate([r]) == {"textvqa_exact_match": 1.0}
    # submission-only test split: normalized pred rides samples.jsonl
    tt = get_task("textvqa_test")
    rr = tt.process_results({"question_id": 5, "question": "q",
                             "image": "i.jpg"}, "An apple.")
    assert rr["pred"] == "apple" and rr["exact_match"] == 0.0
    assert tt.aggregate([rr]) == {"submission_rows": 1.0}
    assert t.generation_kwargs["until"] == ["ASSISTANT:"]


def test_gqa_task(tmp_path):
    t = get_task("gqa")
    doc = {"id": "q1", "question": "What color is the car?",
           "answer": "dark blue", "imageId": "n100"}
    assert t.doc_to_text(doc).endswith("single word or phrase.")
    # exact_match with ignore_case + ignore_punctuation (gqa.yaml:17-21)
    assert t.process_results(doc, "Dark Blue!")["exact_match"] == 1.0
    assert t.process_results(doc, "blue")["exact_match"] == 0.0
    agg = t.aggregate([t.process_results(doc, "dark blue"),
                       t.process_results(doc, "red")])
    assert agg == {"gqa_exact_match": 0.5}
    # visual join by imageId under data_root/images (utils.py:7-16 join)
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    (imgdir / "n100.jpg").write_bytes(b"\xff\xd8")
    assert t.doc_to_visual(doc, data_root=str(tmp_path)).endswith("n100.jpg")
    # pre-joined rows carry an explicit image path
    (tmp_path / "x.jpg").write_bytes(b"\xff\xd8")
    assert t.doc_to_visual({"image": "x.jpg", "imageId": "n100"},
                           data_root=str(tmp_path)).endswith("x.jpg")


def test_ocrbench_scoring_and_rollup():
    from videoitg_tpu.eval.tasks.ocrbench import score_response

    t = get_task("ocrbench")
    # containment, case-folded (utils.py:49-58)
    assert score_response("The text reads HELLO world", "hello", "STVQA") == 1
    assert score_response("goodbye", "hello", "STVQA") == 0
    # list-valued golds: any match counts
    assert score_response("b", ["a", "b"], "STVQA") == 1
    # HME100k drops all whitespace on both sides...
    assert score_response("x ^ 2 + 1", "x^2+1", "HME100k") == 1
    # ...and (bug-for-bug) never lowercases the gold there
    assert score_response("x+y", "X+Y", "HME100k") == 0
    assert score_response("x+y", "X+Y", "STVQA") == 1

    recs = [{"question_type": "Regular Text Recognition", "score": 1},
            {"question_type": "Doc-oriented VQA", "score": 1},
            {"question_type": "Doc-oriented VQA", "score": 0},
            {"question_type":
             "Handwritten Mathematical Expression Recognition", "score": 1}]
    agg = t.aggregate(recs)
    assert agg["ocrbench_final_score"] == 3.0
    assert agg["ocrbench_accuracy"] == pytest.approx(0.003)
    assert agg["ocrbench_text_recognition"] == 1.0
    assert agg["ocrbench_doc_oriented_vqa"] == 1.0
    assert agg["ocrbench_hmer"] == 1.0
    assert t.primary_metric == "ocrbench_accuracy"


# --- VQAv2 / OK-VQA / VizWiz / ST-VQA (round-4 batch 3) ----------------------


def test_vqav2_accuracy_variant_quirks():
    """vqav2/utils.py:17-51 — the conditional second pass and
    dict-inequality exclusion."""
    from videoitg_tpu.eval.vqa_answer import vqa_accuracy_v2

    # unanimous gold skips normalization: uppercase gold never matches
    acc, res = vqa_accuracy_v2("yes", [{"answer": "YES"}] * 10)
    assert acc == 0.0 and res == "yes"
    # disagreement triggers the punct+digit pass (which lowercases);
    # with realistic rows (distinct answer_id) every annotator matches
    acc, _ = vqa_accuracy_v2(
        "yes", [{"answer": "YES", "answer_id": i} for i in range(9)]
        + [{"answer": "no", "answer_id": 9}])
    assert acc == 1.0
    # minimal rows (answer only): the 9 normalized-equal "yes" dicts all
    # drop out of each other's leave-one-out -> 0 matches for them
    acc, _ = vqa_accuracy_v2("yes", [{"answer": "YES"}] * 9
                             + [{"answer": "no"}])
    assert acc == pytest.approx(0.1)
    # dict-equal rows drop out together in the leave-one-out
    acc_dup, _ = vqa_accuracy_v2("cat", [{"answer": "cat"}] * 3
                                 + [{"answer": "dog", "answer_id": i}
                                    for i in range(7)])
    # every "cat" row excludes ALL 3 cat rows -> sees 0 matches; dogs see 3
    assert acc_dup == pytest.approx(7 * 1.0 / 10)
    assert vqa_accuracy_v2("x", [])[0] == 0.0


@pytest.mark.skipif(not os.path.exists(
    "/root/reference/lmms_eval/tasks/vqav2/utils.py"),
    reason="reference checkout not present")
def test_vqav2_accuracy_matches_reference_fuzz():
    """Randomized parity vs the vendored vqav2_process_results (loguru +
    file_utils stubbed; the real EvalAIAnswerProcessor is loaded)."""
    import copy
    import importlib.util
    import random
    import sys
    import types

    def _stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    _stub("loguru", logger=types.SimpleNamespace(
        info=lambda *a, **k: None))
    for pkg in ("lmms_eval", "lmms_eval.tasks", "lmms_eval.tasks._task_utils"):
        _stub(pkg)
    _stub("lmms_eval.tasks._task_utils.file_utils",
          generate_submission_file=lambda *a, **k: "/tmp/x.json")
    spec = importlib.util.spec_from_file_location(
        "lmms_eval.tasks._task_utils.vqa_eval_metric",
        "/root/reference/lmms_eval/tasks/_task_utils/vqa_eval_metric.py")
    vm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vm)
    sys.modules["lmms_eval.tasks._task_utils.vqa_eval_metric"] = vm
    spec2 = importlib.util.spec_from_file_location(
        "ref_vqav2", "/root/reference/lmms_eval/tasks/vqav2/utils.py")
    ref = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(ref)

    from videoitg_tpu.eval.vqa_answer import vqa_accuracy_v2

    rng = random.Random(7)
    vocab = ["two", "dogs", "a", "the", "isnt", "none", "1,000", "3.5",
             "Yes.", "YES", "stop sign", "unanswerable"]
    for i in range(300):
        answers = [{"answer": rng.choice(vocab),
                    "answer_id": j if rng.random() < 0.8 else 0}
                   for j in range(rng.randint(1, 10))]
        pred = rng.choice(vocab) + ("" if rng.random() < 0.7 else " x.")
        r = ref.vqav2_process_results(
            {"question_id": i, "answers": copy.deepcopy(answers)}, [pred])
        acc, res = vqa_accuracy_v2(pred, answers)
        assert r["exact_match"] == pytest.approx(acc), (pred, answers)
        assert r["submission"]["answer"] == res


def test_vqav2_tasks_registered():
    t = get_task("vqav2_val")
    doc = {"question_id": 1, "question": "what animal?", "image": "i.jpg",
           "answers": [{"answer": "dog"}] * 6
           + [{"answer": "a dog", "answer_id": i} for i in range(4)]}
    r = t.process_results(doc, "Dog")
    assert r["exact_match"] == 1.0 and r["pred"] == "dog"
    assert t.aggregate([r]) == {"vqav2_exact_match": 1.0}
    tt = get_task("vqav2_test")
    assert tt.aggregate([tt.process_results(
        {"question_id": 2, "question": "q", "image": "i.jpg"}, "x")]) == \
        {"submission_rows": 1.0}


def test_ok_vqa_and_vizwiz_tasks():
    ok = get_task("ok_vqa_val2014")
    doc = {"question_id": 9, "question": "what brand?",
           "answers": ["nike"] * 10, "image": "i.jpg"}
    assert "Unanswerable" in ok.doc_to_text(doc)
    r = ok.process_results(doc, "Nike.")
    assert r["exact_match"] == 1.0 and r["image"] == "9.jpg"
    assert ok.aggregate([r]) == {"ok_vqa_exact_match": 1.0}
    assert ok.generation_kwargs["until"] == ["ASSISTANT:"]

    vw = get_task("vizwiz_vqa_val")
    doc = {"question_id": 3, "question": "what is this?",
           "answers": ["soda can"] * 10, "image": "i.jpg"}
    # vizwiz capitalizes the question (utils.py:60)
    assert vw.doc_to_text(doc).startswith("What is this?")
    assert vw.process_results(doc, "a soda can")["exact_match"] == 1.0
    assert get_task("vizwiz_vqa_test").aggregate([]) == \
        {"submission_rows": 0.0}


def test_stvqa_submission_rows():
    t = get_task("stvqa")
    r = t.process_results({"question_id": "77", "question": "q",
                           "image": "i.jpg"}, "Main St.")
    # raw response, int-cast id (stvqa/utils.py:19-21)
    assert r == {"question_id": 77, "answer": "Main St."}
    assert t.aggregate([r]) == {"submission_rows": 1.0}


def test_vqa_groups():
    from videoitg_tpu.eval.api import GROUP_REGISTRY

    assert GROUP_REGISTRY["vqav2"] == ["vqav2_val", "vqav2_test"]
    assert GROUP_REGISTRY["vqa_bench"] == ["textvqa_val", "vqav2_val",
                                           "ok_vqa_val2014",
                                           "vizwiz_vqa_val", "gqa",
                                           "ocrbench"]


# --- Captioning family (round-4 batch 4) -------------------------------------


def test_captioning_family_registration():
    for name in ("coco2014_cap_val", "coco2014_cap_test", "coco2017_cap_val",
                 "coco2017_cap_test", "nocaps_val", "nocaps_test",
                 "textcaps_val", "textcaps_test", "flickr30k_test"):
        assert get_task(name) is not None, name
    from videoitg_tpu.eval.api import GROUP_REGISTRY

    assert GROUP_REGISTRY["coco_cap"] == ["coco2014_cap_val",
                                          "coco2014_cap_test",
                                          "coco2017_cap_val",
                                          "coco2017_cap_test"]


def test_coco_caption_scoring_end_metrics():
    t = get_task("coco2014_cap_val")
    assert t.doc_to_text({}) == ("Provide a one-sentence caption for the "
                                 "provided image.")
    doc = {"question_id": "COCO_val2014_000000391895.jpg",
           "answer": ["a man riding a bike", "man rides a red bike"],
           "image": "i.jpg"}
    r = t.process_results(doc, "a man riding a bike")
    # filename-style question_id parses to the numeric id
    # (coco_cap/utils.py:33-35)
    assert r["image_id"] == 391895
    doc2 = {"question_id": "COCO_val2014_000000000042.jpg",
            "answer": ["two cats sleeping on a couch"], "image": "j.jpg"}
    r2 = t.process_results(doc2, "two cats sleeping on a couch")
    agg = t.aggregate([r, r2])
    assert agg["coco2014_cap_Bleu_1"] == pytest.approx(1.0)
    # CIDEr needs corpus-level idf: a 1-doc corpus scores 0 by definition
    assert agg["coco2014_cap_CIDEr"] > 0
    assert t.primary_metric == "coco2014_cap_CIDEr"
    # test split is submission-only passthrough
    tt = get_task("coco2014_cap_test")
    rr = tt.process_results(doc, "whatever caption")
    assert rr == {"image_id": 391895, "pred": "whatever caption"}
    assert tt.aggregate([rr]) == {"submission_rows": 1.0}


def test_nocaps_textcaps_flickr_field_mapping():
    nv = get_task("nocaps_val")
    r = nv.process_results({"image_id": 5, "image": "i.jpg",
                            "annotations_captions": ["a dog", "the dog"]},
                           "a dog")
    assert r["image_id"] == 5 and r["answer"] == ["a dog", "the dog"]
    assert nv.aggregate([r])["nocaps_Bleu_1"] == pytest.approx(1.0)

    tc = get_task("textcaps_val")
    r = tc.process_results({"image_id": "abc", "image": "i.jpg",
                            "caption_str": ["sign says stop"]},
                           "sign says stop")
    # textcaps keeps the raw (string) image_id (utils.py:52, no int cast)
    assert r["image_id"] == "abc"

    fl = get_task("flickr30k_test")
    r = fl.process_results({"img_id": "42", "image": "i.jpg",
                            "caption": ["kids playing soccer"]},
                           "kids playing soccer")
    assert r["image_id"] == 42  # int cast (flickr30k/utils.py:35)
    r2 = fl.process_results({"img_id": "43", "image": "j.jpg",
                             "caption": ["a red barn in a field"]},
                            "a red barn in a field")
    agg = fl.aggregate([r, r2])
    assert agg["flickr_CIDEr"] > 0
    assert fl.primary_metric == "flickr_CIDEr"


# ---------------------------------------------------------------------------
# MathVista (tasks/mathvista.py vs mathvista_evals.py + the 4 yamls)
# ---------------------------------------------------------------------------

def _mv_doc(**kw):
    d = {"pid": "1", "question": "Which number is missing?",
         "query": "Hint: ...\nQuestion: Which number is missing?",
         "choices": [], "unit": "", "precision": 0,
         "question_type": "free_form", "answer_type": "integer",
         "answer": "14", "image": "img.jpg",
         "metadata": {"task": "math word problem", "language": "english",
                      "source": "iconqa", "category": "general-vqa",
                      "context": "abstract scene", "grade": "elementary",
                      "skills": ["arithmetic"]}}
    d.update(kw)
    return d


def test_mathvista_create_one_query_variants():
    from videoitg_tpu.eval.tasks.mathvista import create_one_query

    mc = {"question": "What fraction is blue?", "unit": "",
          "choices": ["3/11", "8/11"], "precision": 0,
          "question_type": "multi_choice", "answer_type": "text"}
    # solution shot_type (mathvista_evals.py:437-441 + 549-551)
    q = create_one_query(mc, "solution")
    assert q == ("Question: What fraction is blue?\n"
                 "Choices:\n(A) 3/11\n(B) 8/11\n"
                 "Hint: Please answer the question and provide the correct "
                 "option letter, e.g., A, B, C, D, at the end.\n"
                 "Solution:")  # .strip() eats the trailing space
    # format-prompt: bare question, "A. x" options, no "Solution:" cue
    q = create_one_query(mc, "format-prompt")
    assert q == ("What fraction is blue?\nA. 3/11\nB. 8/11\n"
                 "Answer with the option's letter from the given choices "
                 "directly.")
    # step-by-step shares solution hints but drops the cue
    q = create_one_query(mc, "step-by-step")
    assert q.endswith("at the end.") and "Solution:" not in q
    # reason-first puts the hint FIRST (mathvista_evals.py:564-566)
    ff = {"question": "How much money?", "unit": "$", "choices": [],
          "precision": 2, "question_type": "free_form",
          "answer_type": "float"}
    q = create_one_query(ff, "reason-first")
    assert q.startswith("First perform reasoning")
    assert "Question: How much money? (Unit: $)" in q
    assert "two decimal places" in q


def test_mathvista_extract_and_normalize():
    from videoitg_tpu.eval.tasks.mathvista import (
        extract_answer, get_most_similar, normalize_extracted_answer,
        safe_equal)

    mc = {"question_type": "multi_choice", "answer_type": "text",
          "choices": ["3/11", "8/11"], "query": "q"}
    # direct membership short-circuit (mathvista_evals.py:240-241)
    assert extract_answer("8/11", mc) == "8/11"
    ff_int = {"question_type": "free_form", "answer_type": "integer",
              "choices": [], "query": "q"}
    assert extract_answer("14", ff_int) == "14"
    ff_f = {"question_type": "free_form", "answer_type": "float",
            "choices": [], "query": "q"}
    assert extract_answer("1.45", ff_f) == "1.45"
    # quick-extract regex
    assert extract_answer('bla The answer is "42". bla', ff_int,
                          quick_extract=True) == "42"

    # normalize: "(B)" letter pull -> option text
    assert normalize_extracted_answer("(B) 8/11", ["3/11", "8/11"],
                                      "multi_choice", "text", 0) == "8/11"
    assert normalize_extracted_answer("B", ["3/11", "8/11"],
                                      "multi_choice", "text", 0) == "8/11"
    # not a letter -> Levenshtein most-similar
    assert normalize_extracted_answer("8 / 11", ["3/11", "8/11"],
                                      "multi_choice", "text", 0) == "8/11"
    assert get_most_similar("cat", ["cart", "dog"]) == "cart"
    # int goes through float (mathvista_evals.py:318: int(float(x)))
    assert normalize_extracted_answer("14.0", [], "free_form",
                                      "integer", 0) == "14"
    assert normalize_extracted_answer("1.456", [], "free_form",
                                      "float", 2) == "1.46"
    assert normalize_extracted_answer("junk", [], "free_form",
                                      "float", 2) is None
    assert safe_equal(" 14 ", "14") and not safe_equal("14", "15")


def test_mathvista_judge_extraction_standin():
    """The offline exact-match judge answers the DEMO_PROMPT extraction
    call deterministically (judge.py _extraction_prompt)."""
    from videoitg_tpu.eval.judge import ExactMatchJudge
    from videoitg_tpu.eval.tasks.mathvista import DEMO_PROMPT

    j = ExactMatchJudge()

    def ask(query, response):
        p = f"{DEMO_PROMPT.strip()}\n\n{query}\n\n{response}\n\nExtracted answer: "
        return j([{"role": "user", "content": p}])

    assert ask("Question: q", "The missing number is 14.") == "14"
    assert ask("Question: q", "Reasoning...\n\nThe correct answer is (B) 8/11.") == "B"
    assert ask("Question: q", "Answer: 1.45") == "1.45"
    assert ask("Question: q", "The peak is between [2007, 2008].") == "[2007, 2008]"
    assert ask("Question: q", "Answer: B") == "B"


def test_mathvista_process_and_aggregate():
    t = get_task("mathvista_testmini_cot")
    r = t.process_results(_mv_doc(), "After reasoning, Answer: 14")
    assert r["prediction"] == "14" and r["true_false"] is True
    assert r["task"] == "math word problem"
    r2 = t.process_results(
        _mv_doc(pid="2", question_type="multi_choice", answer_type="text",
                choices=["red", "blue"], answer="blue",
                metadata={"task": "figure question answering"}),
        "The answer is (A) red.")
    assert r2["prediction"] == "red" and r2["true_false"] is False
    agg = t.aggregate([r, r2])
    assert agg["mathvista_accuracy"] == 50.0
    assert agg["mathvista_question_type_free_form"] == 100.0
    assert agg["mathvista_task_figure_question_answering"] == 0.0
    assert t.primary_metric == "mathvista_accuracy"

    # test split: withheld answers -> submission rows only
    tt = get_task("mathvista_test")
    rr = tt.process_results(_mv_doc(answer=None), "Answer: 7")
    assert rr["true_false"] is False
    assert tt.aggregate([rr]) == {"submission_rows": 1.0}


def test_mathvista_registration_and_groups():
    from videoitg_tpu.eval.api import GROUP_REGISTRY

    for n in ("mathvista_testmini_cot", "mathvista_testmini_solution",
              "mathvista_testmini_format", "mathvista_test"):
        assert get_task(n) is not None
    assert set(GROUP_REGISTRY["mathvista_testmini"]) == {
        "mathvista_testmini_cot", "mathvista_testmini_solution",
        "mathvista_testmini_format"}
    # phi3v override flips to the solution-style prompt (yaml kwargs)
    t = get_task("mathvista_testmini_format")
    doc = _mv_doc(choices=["a", "b"], question_type="multi_choice",
                  answer_type="text")
    assert "option's letter" in t.doc_to_text(doc)
    kw = t.prompt_overrides.get("phi3v")
    assert "Solution:" in t.doc_to_text(doc, **kw)


# ---------------------------------------------------------------------------
# MathVerse (tasks/mathverse.py vs mathverse_evals.py + 7 yamls)
# ---------------------------------------------------------------------------

def test_mathverse_query_builder():
    from videoitg_tpu.eval.tasks.mathverse import create_one_query

    p = {"question": "Find x.", "query_wo": "plain query", "query_cot":
         "cot query", "question_type": "multi-choice"}
    # format-prompt (every vendored yaml) reduces to the prebuilt query
    assert create_one_query(p, "format-prompt") == "plain query"
    assert create_one_query(p, "format-prompt",
                            query_type="query_cot") == "cot query"
    # custom-prompt: hint by question type, "Question: ..." text
    hint = {"multi-choice": "Pick a letter.", "free-form": "Answer freely."}
    assert (create_one_query(p, "custom-prompt", hint=hint)
            == "Pick a letter.\nQuestion: Find x.")
    p2 = dict(p, question_type="free-form")
    assert create_one_query(p2, "custom-prompt", hint=hint).startswith(
        "Answer freely.")
    with pytest.raises(ValueError):
        create_one_query(p, "solution")


def test_mathverse_judge_standins():
    from videoitg_tpu.eval.judge import ExactMatchJudge
    from videoitg_tpu.eval.tasks.mathverse import (
        DEMO_PROMPT_EXTRACT, DEMO_PROMPT_SCORE, extract_answer,
        score_answer)

    j = ExactMatchJudge()
    # extraction shape
    p = (f"{DEMO_PROMPT_EXTRACT.strip()}\n\nModel response: 'Therefore "
         f"the distance is approximately 22.3 meters.'\nExtracted Answer: ")
    assert j([{"role": "user", "content": p}]) == "22.3"
    assert extract_answer("The correct option is (D).", judge=j) == "D"
    assert extract_answer("", judge=j) == ""
    # consistency shape: exact + containment + miss
    assert score_answer("q", "C", "C", judge=j) is True
    assert score_answer("q", "22.3", "approximately 22.3", judge=j) is True
    assert score_answer("q", "C", "B", judge=j) is False
    # quick_match bypasses the judge entirely
    assert score_answer("q", "C", "C", quick_match=True) is True
    assert score_answer("q", "0.5m", "50cm", quick_match=True) is False
    # the format slots survive the demo's {{3}} escaping
    filled = DEMO_PROMPT_SCORE.strip().format(question="Q", gt="G",
                                              extraction="E")
    assert "[Standard Answer]: G" in filled and "2√{3}" in filled


def test_mathverse_process_and_aggregate():
    t = get_task("mathverse_testmini_vision_dominant")
    doc = {"sample_index": "7", "problem_index": "3",
           "problem_version": "Vision Dominant",
           "question": "Find x.", "answer": "42",
           "question_type": "free-form",
           "query_wo": "Find x directly.", "query_cot": "Think then find x.",
           "metadata": {"split": "testmini", "subfield": "Plane Geometry"},
           "image": ""}
    assert t.doc_to_text(doc) == "Find x.".replace("Find x.",
                                                   "Find x directly.")
    # 40-word response: trunk_response keeps the LAST 30 words before
    # extraction (mathverse_evals.py:301-304)
    long = " ".join(["word"] * 39 + ["Answer: 42"])
    r = t.process_results(doc, long)
    assert r["extraction"] == "42" and r["true_false"] is True
    assert len(r["prediction"].split(" ")) == 30
    r2 = t.process_results(dict(doc, sample_index="8", answer="7"),
                           "Answer: 42")
    agg = t.aggregate([r, r2])
    assert agg["mathverse_accuracy"] == 50.0
    assert agg["mathverse_problem_version_vision_dominant"] == 50.0
    assert agg["mathverse_subfield_plane_geometry"] == 50.0
    # withheld answer -> scored False, no judge call
    r3 = t.process_results(dict(doc, answer=None), "Answer: 42")
    assert r3["true_false"] is False


def test_mathverse_registration_and_visuals():
    from videoitg_tpu.eval.api import GROUP_REGISTRY
    from videoitg_tpu.eval.tasks.mathverse import doc_to_visual

    assert len(GROUP_REGISTRY["mathverse"]) == 7
    for n in GROUP_REGISTRY["mathverse"]:
        assert get_task(n) is not None
    # blank image -> no visual (text_only split, utils.py:26-29)
    assert doc_to_visual({"image": ""}) is None
    assert doc_to_visual({"image": None}) is None
    # zero-frame adapter path: text-only docs run end to end
    a = get_adapter("echo-answer")()
    frames, ids = a.frames_for_doc("d1", None)
    assert frames.shape[0] == 0 and ids == []


# ---------------------------------------------------------------------------
# MM-Vet v1/v2 (tasks/mmvet.py vs mmvet/utils.py + mmvetv2/utils.py)
# ---------------------------------------------------------------------------

def test_mmvet_judge_rubric_standin():
    from videoitg_tpu.eval.tasks.mmvet import judge_score

    # <AND>: fraction of required elements present (rubric exemplars)
    assert judge_score("What is x?", "-1<AND>-5", "x = 3") == 0.0
    assert judge_score("What is x?", "-1<AND>-5", "x = -1") == 0.5
    assert judge_score("What is x?", "-1<AND>-5",
                       "x = -1 or x = -5") == 1.0
    # <OR>: any element suffices
    assert judge_score("q", "cat<OR>dog", "I see a dog") == 1.0
    assert judge_score("q", "cat<OR>dog", "a bird") == 0.0
    # multiline predictions survive the prompt parse
    assert judge_score("q", "paris", "Reasoning...\nline two\nParis.") == 1.0


def test_mmvet_v1_task():
    t = get_task("mmvet")
    doc = {"question_id": "v1_0", "question": "What is x?",
           "answer": "-1 <AND> -5", "capability": "rec,math",
           "image": None}
    assert t.doc_to_text(doc).startswith("First please perform reasoning")
    r = t.process_results(doc, "x = -1")
    assert r["score"] == 0.5 and r["capabilities"] == "rec,math"
    r2 = t.process_results(
        {"question_id": "v1_1", "question": "color?", "answer": "red",
         "capability": "rec", "image": None}, "red")
    agg = t.aggregate([r, r2])
    assert agg["mmvet_overall"] == pytest.approx(75.0)
    assert agg["mmvet_rec"] == pytest.approx(75.0)
    assert agg["mmvet_math"] == pytest.approx(50.0)
    assert agg["mmvet_detail_math_rec"] == pytest.approx(50.0)
    assert agg["mmvet_detail_rec"] == pytest.approx(100.0)


def test_mmvetv2_prompt_and_visual_order():
    from PIL import Image

    t = get_task("mmvetv2")
    img_a = Image.new("RGB", (30, 20), (255, 0, 0))
    img_b = Image.new("RGB", (20, 40), (0, 255, 0))
    doc = {"id": "v2_0",
           "question": "Compare <image_2><IMG> with <image_0><IMG> now.",
           "answer": "same", "capability": ["rec", "seq"],
           "image_0": img_a, "image_2": img_b}
    # <IMG> separators dropped, <image_N> tokens kept
    # (interleaved_format: false in the vendored config)
    txt = t.doc_to_text(doc)
    assert "<IMG>" not in txt and "<image_2>" in txt
    # visuals resolve in question-token order: image_2 first
    vis = t.doc_to_visual(doc)
    assert vis[0] is not img_a and vis[0].size == (20, 40)
    r = t.process_results(doc, "they are the same")
    assert r["score"] == 1.0 and r["capabilities"] == ["rec", "seq"]
    agg = t.aggregate([r])
    assert agg["mmvetv2_overall"] == pytest.approx(100.0)
    assert agg["mmvetv2_seq"] == pytest.approx(100.0)
    assert agg["mmvetv2_detail_rec_seq"] == pytest.approx(100.0)


def test_mmvetv2_group_img_composite():
    from PIL import Image

    from videoitg_tpu.eval.tasks.mmvet import process_images

    # two wide images: horizontal concat would be extremely wide, so the
    # vertical composite wins (utils.py:124-138 aspect-ratio rule)
    wide = [Image.new("RGB", (800, 100), (i * 80, 10, 10))
            for i in range(2)]
    comp = process_images(wide, size=100)
    # vertical layout: width pinned to size, heights stacked (2 x 12)
    assert comp.size == (100, 24)
    # two tall images -> horizontal wins: height pinned, widths abut
    tall = [Image.new("RGB", (100, 800), (10, i * 80, 10))
            for i in range(2)]
    comp = process_images(tall, size=100)
    assert comp.size == (24, 100)
    # the composite rides the adapter's PIL branch end to end
    a = get_adapter("echo-answer")()
    frames, ids = a.frames_for_doc("d", comp)
    assert frames.shape[0] == 1 and ids == [0]
    # and the group task is registered with the composite visual
    t = get_task("mmvetv2_group_img")
    doc = {"id": "g0", "question": "<image_0> what?", "answer": "x",
           "capability": ["rec"], "image_0": wide[0]}
    v = t.doc_to_visual(doc)
    assert hasattr(v, "size")


# ---------------------------------------------------------------------------
# HallusionBench (tasks/hallusion_bench.py vs evaluate_hb.py + utils.py)
# ---------------------------------------------------------------------------

def _hb_doc(qid, fid, cat="VD", sub="illusion", sid=0, gt="1",
            details="Yes, the segments are equal.", vi="1"):
    return {"question": "Are they equal?", "gt_answer": gt,
            "gt_answer_details": details, "category": cat,
            "subcategory": sub, "set_id": sid, "figure_id": fid,
            "question_id": qid, "visual_input": vi, "image": None}


def test_hallusion_teacher_judge_standin():
    from videoitg_tpu.eval.tasks.hallusion_bench import judge_correctness

    # matching yes polarity -> correct -> "1"
    assert judge_correctness("q", "Yes, equal.", "Yes they are.") == "1"
    # opposing polarity -> incorrect -> "0"
    assert judge_correctness("q", "Yes, equal.", "No, different.") == "0"
    # prediction with no polarity -> unclear -> "2"
    assert judge_correctness("q", "Yes, equal.", "Cannot tell.") == "2"


def test_hallusion_correctness_rules_and_aggregation():
    t = get_task("hallusion_bench_image")
    # VD pair: with-figure answered right, edited-figure answered wrong
    r1 = t.process_results(_hb_doc(0, 0), "Yes")
    r2 = t.process_results(_hb_doc(0, 1, details="No, they differ.",
                                   gt="0"), "Yes")
    # VS figure_id 0 (no visual): unclear counts as CORRECT
    # (utils.py:166-168)
    r3 = t.process_results(_hb_doc(1, 0, cat="VS", vi="0"),
                           "I cannot tell without more context.")
    assert r3["gpt_check"] == "2"
    agg = t.aggregate([r1, r2, r3])
    # aAcc: r1 + r3 correct of 3
    assert agg["hallusion_aAcc"] == pytest.approx(round(200 / 3, 4))
    # fAcc: VS fig-0 excluded; two VD figures -> fig0 all-correct,
    # fig1 wrong -> 50
    assert agg["hallusion_fAcc"] == 50.0
    # qAcc: VD pair (q0 over fig0+fig1) fails; VS q1 passes -> 50
    assert agg["hallusion_qAcc"] == 50.0


def test_hallusion_intern_variant():
    t = get_task("hallusion_bench_image_intern")
    r1 = t.process_results(_hb_doc(0, 0, gt="1"), "Yes it is")
    r2 = t.process_results(_hb_doc(0, 1, gt="0"), "yes")  # wrong
    r3 = t.process_results(_hb_doc(1, 1, gt="0"), "Absolutely not")
    assert r1["hit"] and not r2["hit"] and r3["hit"]
    agg = t.aggregate([r1, r2, r3])
    assert agg["hallusion_aAcc"] == pytest.approx(round(200 / 3, 4))
    # qAcc groups: (q0: hit,miss -> 0), (q1: hit -> 1) => 50
    assert agg["hallusion_qAcc"] == 50.0
    # fAcc groups: (fig0: hit), (fig1: miss,hit -> 0) => 50
    assert agg["hallusion_fAcc"] == 50.0


# ---------------------------------------------------------------------------
# RefCOCO family (tasks/refcoco.py vs refcoco/utils.py + utils_rec.py)
# ---------------------------------------------------------------------------

def test_refcoco_bbox_parse_and_metrics():
    from videoitg_tpu.eval.tasks.refcoco import (
        compute_center_accuracy, compute_iou, parse_float_sequence_within)

    assert parse_float_sequence_within(
        "The box is [0.1, 0.2, 0.5, 0.6].") == [0.1, 0.2, 0.5, 0.6]
    # first bracketed run wins; no match -> zeros
    assert parse_float_sequence_within("[1,2,3,4] then [5,6,7,8]") == [1, 2, 3, 4]
    assert parse_float_sequence_within("no box here") == [0, 0, 0, 0]
    # IoU of identical boxes is 1; disjoint is 0
    assert compute_iou([0, 0, 1, 1], [0, 0, 1, 1]) == 1.0
    assert compute_iou([0, 0, .5, .5], [.5, .5, 1, 1]) == 0.0
    # half-overlap
    assert compute_iou([0, 0, 1, 1], [0, 0, 1, .5]) == pytest.approx(0.5)
    # center rule: center of PRED inside GOLD
    assert compute_center_accuracy([0, 0, 1, 1], [0.4, 0.4, 0.6, 0.6])
    assert not compute_center_accuracy([0, 0, .2, .2], [0.8, 0.8, 1, 1])


def test_refcoco_rec_explode_and_aggregate(tmp_path):
    from PIL import Image

    from videoitg_tpu.eval.api import get_task
    from videoitg_tpu.eval.tasks.refcoco import rec_explode_docs

    img = tmp_path / "i.png"
    Image.new("RGB", (100, 50), (5, 5, 5)).save(img)
    docs = [{"question_id": 7, "image": str(img),
             "bbox": [10, 10, 20, 30],  # xywh, pixel space
             "answer": ["the red car", "a car"]}]
    rows = rec_explode_docs(docs)
    assert len(rows) == 2 and rows[0]["answer"] == "the red car"
    # normalized xyxy via image dims (100x50)
    assert rows[0]["bbox"] == pytest.approx([0.1, 0.2, 0.3, 0.8])

    t = get_task("refcoco_bbox_rec_val")
    assert t.doc_to_text(rows[0]).endswith("describes: the red car")
    r_exact = t.process_results(rows[0], "[0.1, 0.2, 0.3, 0.8]")
    r_near = t.process_results(rows[1], "box: [0.1, 0.2, 0.3, 0.6]")
    agg = t.aggregate([r_exact, r_near])
    assert agg["refcoco_IoU"] == pytest.approx((1.0 + 2 / 3) / 2)
    assert agg["refcoco_ACC@0.5"] == 1.0
    assert agg["refcoco_ACC@0.7"] == 0.5
    assert agg["refcoco_Center_ACC"] == 1.0


def test_refcoco_caption_tasks_and_visual_overlays(tmp_path):
    import numpy as np
    from PIL import Image

    from videoitg_tpu.eval.api import GROUP_REGISTRY, get_task

    img = tmp_path / "j.png"
    Image.new("RGB", (60, 40), (9, 9, 9)).save(img)
    doc = {"question_id": 1, "image": str(img), "bbox": [5, 5, 20, 10],
           "segmentation": [2, 2, 30, 2, 30, 20],
           "answer": ["a thing on the left"]}
    t = get_task("refcoco_bbox_val")
    assert t.doc_to_text(doc) == ("Provide a short description for this "
                                  "region.")
    # the visual is the image with a red rectangle drawn (xywh -> xyxy)
    v = t.doc_to_visual(doc)
    a = np.asarray(v)
    assert tuple(a[5, 5]) == (255, 0, 0) and tuple(a[15, 25]) == (255, 0, 0)
    assert tuple(a[0, 0]) == (9, 9, 9)
    # seg variant draws the polygon instead
    vs = get_task("refcoco_seg_val").doc_to_visual(doc)
    assert np.asarray(vs).shape == (40, 60, 3)
    r = t.process_results(doc, "a thing on the left")
    r2 = t.process_results({**doc, "question_id": 2,
                            "answer": ["a bright green box"]},
                           "a bright green box")
    agg = t.aggregate([r, r2])
    assert agg["refcoco_Bleu_1"] == pytest.approx(1.0)
    assert agg["refcoco_CIDEr"] > 0  # needs >1 doc: idf is corpus-level
    # 27 registered tasks, groups mirror the yaml group fields
    assert len(GROUP_REGISTRY["refcoco_bbox_rec"]) == 4
    assert len(GROUP_REGISTRY["refcoco+_seg"]) == 3
    assert len(GROUP_REGISTRY["refcocog_bbox"]) == 2
    for g in ("refcoco+_bbox_rec", "refcocog_seg"):
        for n in GROUP_REGISTRY[g]:
            assert get_task(n) is not None


# ---------------------------------------------------------------------------
# MuirBench + MME-RealWorld
# ---------------------------------------------------------------------------

def test_muirbench_prompt_filter_and_rollups():
    from videoitg_tpu.eval.filters import apply_task_filters

    t = get_task("muirbench")
    doc = {"question": "Which image shows a cat?",
           "options": ["first", "second"], "answer": "A", "idx": 0,
           "task": "Ordering", "image_relation": "x", "image_type": "y",
           "image_list": []}
    txt = t.doc_to_text(doc)
    assert "A. first\nB. second" in txt
    assert txt.endswith("directly.")
    # filter: leading "B." wins; free text passes through
    assert apply_task_filters(t, ["B. the second one"], [doc]) == ["B"]
    assert apply_task_filters(t, ["the second"], [doc]) == ["the second"]
    r_hit = t.process_results(doc, "A")
    r_miss = t.process_results(dict(doc, idx=1, task="Counting"), "B")
    agg = t.aggregate([r_hit, r_miss])
    assert agg["muirbench_score_overall"] == 0.5
    assert agg["muirbench_score_ordering"] == 1.0
    assert agg["muirbench_score_counting"] == 0.0


def test_mme_realworld_extract_and_aggregate():
    import base64
    import io

    from PIL import Image

    from videoitg_tpu.eval.tasks.mme_realworld import (
        extract_characters_regex)

    # prefix stripping + first-letter rule
    assert extract_characters_regex("The best answer is C.") == "C"
    assert extract_characters_regex("(B)") == "B"
    # >10 words, no letter -> ""
    assert extract_characters_regex(
        "this is a very long sentence that rambles on and on forever") == ""
    # option-text containment fallback -> letter
    assert extract_characters_regex("(e)") == "E"
    # dict -> "" -> the empty string is "in" every choice, so the
    # containment loop returns "A" (utils.py:117-121, bug-for-bug)
    assert extract_characters_regex({}) == "A"

    t = get_task("mmerealworld")
    doc = {"index": 3, "question": "What is shown?",
           "multi-choice options": ["(A) car", "(B) bus", "(C) bike",
                                    "(D) train", "(E) cannot decide"],
           "answer": "A", "category": "Perception/Monitoring",
           "l2-category": "color/attribute", "bytes": None, "image": None}
    txt = t.doc_to_text(doc)
    assert "The choices are listed below:" in txt
    assert txt.endswith("The best answer is: ")
    r = t.process_results(doc, "The best answer is A")
    r2 = t.process_results(dict(doc, index=4, answer="B",
                                category="Reasoning/Autonomous_Driving",
                                **{"l2-category": "counting"}), "E")
    assert r["pred_answer"] == "A" and r2["is_E"]
    agg = t.aggregate([r, r2])
    assert agg["mme_realworld_score"] == 0.5
    assert agg["mme_realworld_task_perception"] == 1.0
    assert agg["mme_realworld_task_reasoning"] == 0.0
    # attribute l2-categories collapse to "<head>/attribute"
    assert agg["mme_realworld_l2_color_attribute"] == 1.0
    # cn variant prompt
    tc = get_task("mmerealworld_cn")
    assert tc.doc_to_text(doc).endswith("最佳答案为： ")
    # base64 visual decode
    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (1, 2, 3)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    v = t.doc_to_visual({"bytes": b64})
    assert v.size == (8, 8)


# ---------------------------------------------------------------------------
# IconQA + IllusionVQA + Q-Bench family
# ---------------------------------------------------------------------------

def test_iconqa_three_question_types():
    t = get_task("iconqa_val")
    base = {"question_id": "1", "answers": "two", "query_image": None,
            "question": "How many shapes"}
    img_doc = dict(base, ques_type="choose_img")
    txt = t.doc_to_text(img_doc)
    assert "A. The first image.\nB. The second image." in txt
    assert txt.endswith("directly.")
    txt_doc = dict(base, ques_type="choose_txt", choices="cat,dog,fox")
    assert "A. cat\nB. dog\nC. fox" in t.doc_to_text(txt_doc)
    fib = dict(base, ques_type="fill_in_blank")
    assert t.doc_to_text(fib).endswith("single word or phrase.")
    with pytest.raises(ValueError):
        t.doc_to_text(dict(base, ques_type="bogus"))
    r = t.process_results(fib, "two")
    assert r["anls"] == 1.0
    assert t.aggregate([r, t.process_results(fib, "zzz")])[
        "iconqa_anls"] == 0.5


def test_illusionvqa_letter_target_and_scoring():
    from videoitg_tpu.eval.filters import apply_task_filters

    t = get_task("illusionvqa_comprehension")
    doc = {"question": "What do you see?", "options": ["circle", "square"],
           "answer": "square", "image": None}
    assert t.doc_to_target(doc) == "B"
    txt = t.doc_to_text(doc)
    assert txt.startswith("You'll be given an image")
    assert "A. circle\nB. square" in txt
    assert apply_task_filters(t, ["B. square"], [doc]) == ["B"]
    r = t.process_results(doc, "B")
    assert r["exact_match"] == 1.0
    # punctuation/case ignored
    assert t.process_results(doc, "b.")["exact_match"] == 1.0
    assert get_task("illusionvqa_soft_localization") is not None


def test_qbench_options_parse_and_rollups():
    t = get_task("qbench_dev")
    doc = {"id": "q0", "question": "How is the clarity?",
           "option0": "Good", "option1": "Bad", "option2": "N/A",
           "option3": "N/A", "correct_choice": "A",
           "question_concern": 0, "question_type": 1, "image": None}
    txt = t.doc_to_text(doc)
    assert "A. Good\nB. Bad" in txt and "N/A" not in txt
    r = t.process_results(doc, "(A) looks good")
    assert r["parsed_pred"] == "A"
    r2 = t.process_results(dict(doc, id="q1", correct_choice="B",
                                question_concern=2, question_type=0), "A")
    agg = t.aggregate([r, r2])
    # each sample lands in 2 buckets; ins-level acc == plain acc
    assert agg["qbench_acc"] == 0.5
    assert agg["qbench_global_distortion"] == 1.0
    assert agg["qbench_yes_no"] == 0.0
    # qbench2 pairs route both images (PIL objects pass through)
    from PIL import Image

    t2 = get_task("qbench2_dev")
    i1, i2 = Image.new("RGB", (4, 4)), Image.new("RGB", (4, 4))
    assert t2.doc_to_visual({"image1": i1, "image2": i2}) == [i1, i2]
    # abench category rollup
    ta = get_task("abench_dev")
    ra = ta.process_results({"id": "a0", "question": "q", "option0": "x",
                             "option1": "y", "correct_choice": "A",
                             "category": "style", "image": None}, "A")
    assert ta.aggregate([ra])["abench_style"] == 1.0


# ---------------------------------------------------------------------------
# LLaVA-Bench family + WildVision
# ---------------------------------------------------------------------------

def test_llava_bench_review_scoring():
    from videoitg_tpu.eval.tasks.llava_bench import parse_score

    assert parse_score("7 8\ngood") == [7.0, 8.0]
    # bare comma works; "7, 8" does NOT (split on " " leaves an empty
    # token — same upstream, utils.py:97-101)
    assert parse_score("7,8\ngood") == [7.0, 8.0]
    assert parse_score("7, 8\ngood") == [-1, -1]
    assert parse_score("no scores here") == [-1, -1]

    t = get_task("llava_in_the_wild")
    doc = {"question": "Describe the scene.",
           "gpt_answer": "A red car parked near a tall tree.",
           "caption": ["A red car.", "A tall tree."],
           "category": "detail", "image": None, "question_id": 0}
    # exact echo of the reference answer -> stand-in gives 10 10 -> 100.0
    r = t.process_results(doc, "A red car parked near a tall tree.")
    assert r["scores"] == [10.0, 10.0]
    # unrelated answer scores low but >= 1
    r2 = t.process_results(dict(doc, category="conv"),
                           "Nothing interesting.")
    assert r2["scores"][0] == 10.0 and 1 <= r2["scores"][1] <= 3
    agg = t.aggregate([r, r2])
    assert agg["gpt_eval_llava_detail"] == 100.0
    assert agg["gpt_eval_llava_conv"] < 40
    assert agg["gpt_eval_llava_all"] == pytest.approx(
        round(round((10 + r2["scores"][1]) / 2, 3) / 10 * 100, 1))
    assert get_task("llava_bench_coco") is not None


def test_llava_wilder_vision_parts():
    from PIL import Image

    t = get_task("llava_wilder_small")
    doc = {"Question": "What color?", "Answer": "Blue.",
           "image": Image.new("RGB", (6, 6), (0, 0, 255))}
    assert t.doc_to_text(doc) == "What color?"
    r = t.process_results(doc, "Blue.")
    assert r["scores"] == [10.0, 10.0]
    assert t.aggregate([r])["gpt_eval_llava_all"] == 100.0


def test_wildvision_verdict_rules_and_aggregation():
    from videoitg_tpu.eval.tasks.wildvision import (
        classify_verdict, get_score)

    # unique match extraction
    assert get_score("verdict: [[B>A]]")[0] == "B>A"
    assert get_score("no verdict")[0] is None
    assert get_score("[[A=B]] and [[B>A]]")[0] is None
    assert classify_verdict("A>>B") == (-2, "model_a", "Worse++")
    assert classify_verdict("A>B") == (-1, "model_a", "Worse")
    assert classify_verdict("B>>A") == (2, "model_b", "Better++")
    assert classify_verdict("garbage") == (0, "tie", "Unclear")

    t = get_task("wildvision_0617")
    doc = {"instruction": "Describe the image.",
           "claude-3-sonnet-20240229": "A cat sits on a mat near a window.",
           "image": None}
    # echoing the baseline answer -> stand-in declares a tie
    r_tie = t.process_results(doc, "A cat sits on a mat near a window.")
    assert r_tie["winner"] == "tie" and r_tie["judgement"] == "Tie"
    r_worse = t.process_results(doc, "Completely unrelated words entirely.")
    assert r_worse["winner"] == "model_a"
    agg = t.aggregate([r_tie, r_worse])
    # elo win rate closed form: (0 wins + 1 tie/2) / 2 = 25%
    assert agg["wildvision_elo_win_rate"] == 25.0
    assert agg["wildvision_win_rate"] == 0.0
    assert agg["wildvision_judgement_tie"] == 50.0
    assert agg["wildvision_raw_score"] <= 0


# ---------------------------------------------------------------------------
# MultiDocVQA + WebSRC + ScreenSpot
# ---------------------------------------------------------------------------

def test_multidocvqa_evaluator_rules():
    from videoitg_tpu.eval.tasks.multidocvqa import (
        calculate_accuracy, calculate_anls)

    # "none" prediction hard-zeroed in BOTH metrics
    assert calculate_accuracy(["none"], "none") == 0
    assert calculate_anls(["none"], "none") == 0
    assert calculate_accuracy(["paris"], "paris") == 1
    # anls: similarity gate at 0.5
    assert calculate_anls(["answer"], "nswer") == pytest.approx(1 - 1 / 6)
    assert calculate_anls(["abcdef"], "zzzzzz") == 0

    t = get_task("multidocvqa_val")
    doc = {"questionId": "7", "question": "Total?",
           "answers": "['42', 'forty-two']", "image_1": None}
    assert t.doc_to_text(doc).endswith("single word or phrase.")
    r = t.process_results(doc, " 42 ")
    assert r["accuracy"] == 1 and r["anls"] == 1.0
    agg = t.aggregate([r, t.process_results(doc, "none")])
    assert agg["multidocvqa_accuracy"] == 0.5
    # test split emits submission rows
    tt = get_task("multidocvqa_test")
    rr = tt.process_results(doc, "42")
    assert rr == {"questionId": 7, "answer": "42", "answer_page": None}


def test_websrc_f1_and_domains():
    from videoitg_tpu.eval.tasks.websrc import compute_f1

    assert compute_f1("yes", "yes") == 1.0
    assert compute_f1("$25", "25") == pytest.approx(2 * (1 / 1) * (1 / 2)
                                                    / (1 / 1 + 1 / 2))
    assert compute_f1("", "x") == 0.0
    t = get_task("websrc_val")
    doc = {"id": "d1", "page_id": "p1", "domain": "auto",
           "question": "Price?", "answer": "$25", "image": None}
    assert t.doc_to_text(doc).startswith("Answer the question using")
    r = t.process_results(doc, "$25")
    r2 = t.process_results(dict(doc, id="d2", domain="book"), "wrong")
    agg = t.aggregate([r, r2])
    assert agg["websrc_squad_f1"] == 0.5
    assert agg["websrc_f1_auto"] == 1.0 and agg["websrc_f1_book"] == 0.0


def test_screenspot_rec_and_reg(tmp_path):
    import numpy as np
    from PIL import Image

    img = tmp_path / "s.png"
    Image.new("RGB", (50, 50), (7, 7, 7)).save(img)

    t = get_task("screenspot_rec_test")
    doc = {"file_name": "s.png", "instruction": "click the OK button",
           "bbox": [0.1, 0.1, 0.3, 0.3], "data_type": "text",
           "data_source": "ios", "image": str(img)}
    assert "two decimal places" in t.doc_to_text(doc)
    r = t.process_results(doc, "[0.1, 0.1, 0.3, 0.3]")
    r2 = t.process_results(dict(doc, data_type="icon",
                                data_source="macos_shell"), "nothing")
    agg = t.aggregate([r, r2])
    assert agg["screenspot_IoU"] == pytest.approx(0.5)
    assert agg["screenspot_ACC@0.5-mobile_text"] == 1.0
    assert agg["screenspot_ACC@0.5-desktop_icon"] == 0.0
    # REG: xyxy box drawn as-is (no xywh conversion), width 3
    tr = get_task("screenspot_reg_test")
    vdoc = dict(doc, bbox=[5, 5, 20, 20])
    v = tr.doc_to_visual(vdoc)
    a = np.asarray(v)
    assert tuple(a[5, 10]) == (255, 0, 0) and tuple(a[30, 30]) == (7, 7, 7)
    assert tr.doc_to_text(doc) == ("Direct a user to interact with the "
                                   "highlighted region [0.10, 0.10, 0.30, "
                                   "0.30].")
    rr = [tr.process_results(doc, "click the OK button"),
          tr.process_results(dict(doc, instruction="open settings menu"),
                             "open settings menu")]
    assert tr.aggregate(rr)["screenspot_CIDEr"] > 0


# ---------------------------------------------------------------------------
# II-Bench + ConBench + SynthDoG + NaturalBench
# ---------------------------------------------------------------------------

def test_ii_bench_extraction_votes():
    from videoitg_tpu.eval.tasks.ii_bench import extract_option_labels

    assert extract_option_labels("The answer is (C).") == "C"
    # bare letters; most-frequent with LAST-listed tiebreak
    assert extract_option_labels("A or B? I say B") == "B"
    assert extract_option_labels("A then B") == "B"  # tie -> last listed
    # option-text containment fallback
    assert extract_option_labels("the red balloon",
                                 ["a dog", "the red balloon", "x", "y",
                                  "z", "w"]) == "B"
    assert extract_option_labels("no letters at all") is None
    assert extract_option_labels({}) == "error"
    t = get_task("ii_bench")
    doc = {"id": 1, "question": "q?", "option1": "a", "option2": "b",
           "option3": "c", "option4": "d", "option5": "e", "option6": "f",
           "answer": "A", "image": None}
    assert "(A) a" in t.doc_to_text(doc)
    r = t.process_results(doc, "(A)")
    assert t.aggregate([r])["ii_bench_accuracy"] == 1.0


def test_conbench_consistency_score():
    t = get_task("conbench")
    docs = [
        {"image_id": "i1", "question_field": "N/Y", "answer": "Yes",
         "question": "Is it red?", "image": None},
        {"image_id": "i1", "question_field": "Choices", "answer": "B",
         "question": "(A) blue (B) red", "image": None},
        {"image_id": "i1", "question_field": "Q/A", "answer": "red",
         "question": "What color?", "image": None},
    ]
    rs = [t.process_results(docs[0], "Yes, it is."),
          t.process_results(docs[1], " b"),
          t.process_results(docs[2], "Red\n")]
    assert [r["score"] for r in rs] == [1, 1, 1]
    assert t.aggregate(rs)["ConScore_D"] == 1.0
    # one miss on the image -> not consistent
    rs[2] = t.process_results(docs[2], "blue")
    assert t.aggregate(rs)["ConScore_D"] == 0.0
    # Q/A anls gate at 0.95 is strict
    assert t.process_results(docs[2], "redd")["score"] == 0
    assert t.process_results(docs[2], "red")["score"] == 1


def test_synthdog_nted_closed_form():
    from videoitg_tpu.eval.tasks.synthdog import cal_acc_flat

    # exact: ed=0 -> 1 - 1/(1+len)
    gt = "hello world"
    assert cal_acc_flat(gt, gt) == pytest.approx(1 - 1 / 12)
    # totally different text floors at 0
    assert cal_acc_flat("zzz", "ab") == 0.0
    t = get_task("synthdog_en")
    doc = {"image": None, "ground_truth":
           '{"gt_parse": {"text_sequence": "hello world"}}'}
    assert t.doc_to_target(doc) == ["hello world"]
    r = t.process_results(doc, "Hello World")  # lowered before scoring
    assert r["score"] == pytest.approx(1 - 1 / 12)
    agg = t.aggregate([r, t.process_results(doc, "zzz")])
    assert agg["synthdog_ted_sum"] == pytest.approx(r["score"])
    assert agg["synthdog_ted"] == pytest.approx(r["score"] / 2)


def test_naturalbench_group_math():
    from videoitg_tpu.eval.tasks.naturalbench import extract_answer

    assert extract_answer("Yes, it is.") == 1
    assert extract_answer("No.") == 0
    assert extract_answer("yes... no wait") == 1  # first position wins
    assert extract_answer("hmm") == -1
    # mc: case-insensitive word-boundary A/B (a lowercase 'a' hits A)
    assert extract_answer("a", task_type="multiple_choice") == 1
    assert extract_answer("The answer is B",
                          task_type="multiple_choice") == 0

    t = get_task("naturalbench")
    docs = [{"Index": i, "Question": "q", "Question_Type": "yes_no",
             "Image": None} for i in range(8)]
    # group 0 answers perfectly (yes, no, no, yes); group 1 all "yes"
    perfect = ["yes", "no", "no", "yes"]
    always_yes = ["yes"] * 4
    rs = [t.process_results(d, a)
          for d, a in zip(docs, perfect + always_yes)]
    agg = t.aggregate(rs)
    assert agg["naturalbench_G_Acc"] == 0.5
    assert agg["naturalbench_Acc"] == pytest.approx((4 + 2) / 8)
    assert agg["naturalbench_Q_Acc"] == 0.5
    assert agg["naturalbench_I_Acc"] == 0.5
    assert t.doc_to_text(docs[0]).endswith("Please answer Yes or No.")


# ---------------------------------------------------------------------------
# CMMMU + GQA-ru
# ---------------------------------------------------------------------------

def test_cmmmu_mcq_votes_and_prompt():
    from videoitg_tpu.eval.tasks.cmmmu import (
        construct_prompt, get_multi_choice_prediction)

    letters = ["A", "B", "C", "D"]
    i2a = dict(zip(letters, ["红", "蓝", "绿", "黄"]))
    # occurrence-counted: (B) twice beats (A) once
    assert get_multi_choice_prediction("(A) 不对，(B)。就是(B)",
                                       letters, i2a) == "B"
    # multi-select: tied max counts concatenate in ABCD order
    assert get_multi_choice_prediction("(A)(C)", letters, i2a) == "AC"
    # option-text votes
    assert get_multi_choice_prediction("答案是红", letters, i2a) == "A"
    doc = {"type": "选择", "question": '见<img="f1.png">',
           "option1": "红", "option2": "蓝", "option3": "绿",
           "option4": "黄", "image_1_filename": "f1.png", "id": 1}
    p = construct_prompt(doc)
    assert "<图片 1>" in p and '<img="f1.png">' not in p
    assert p.startswith("请回答以下多项选择题")


def test_cmmmu_fill_blank_and_tf():
    from videoitg_tpu.eval.tasks.cmmmu import (
        get_TF_prediction, get_fill_blank_prediction, normalize_str)

    preds = get_fill_blank_prediction("计算后，答案是 42。", "42")
    assert 42.0 in preds
    # length sanity filter drops over-long strings
    assert normalize_str("x" * 100, "short") == []
    assert normalize_str("3,200", "x") == [3200.0]
    tf = get_TF_prediction("这个说法正确。")
    assert any("正确" in p for p in tf)

    t = get_task("cmmmu_val")
    doc = {"id": 5, "type": "判断", "question": "对吗",
           "answer": "对", "subcategory": "数学"}
    r = t.process_results(doc, "这个陈述正确")
    assert t.aggregate([r])["cmmmu_acc"] == 1.0
    assert t.aggregate([r])["cmmmu_科学"] == 1.0
    # fill-in containment scoring
    doc2 = {"id": 6, "type": "填空", "question": "几",
            "answer": "42", "subcategory": "物理"}
    r2 = t.process_results(doc2, "所以等于 42")
    assert t.aggregate([r2])["cmmmu_acc"] == 1.0
    # test split emits submission rows
    tt = get_task("cmmmu_test")
    assert tt.process_results(doc, "x") == {"id": 5, "type": "判断",
                                            "response": "x"}


def test_gqa_ru_task():
    t = get_task("gqa_ru")
    doc = {"id": "r1", "question": "Какого цвета машина?",
           "answer": "красный", "imageId": "n1"}
    assert t.doc_to_text(doc).endswith("Ответь одним словом.")
    assert t.process_results(doc, "Красный.")["exact_match"] == 1.0
    assert t.process_results(doc, "синий")["exact_match"] == 0.0


# ---------------------------------------------------------------------------
# SEED-Bench-2 / 2-Plus
# ---------------------------------------------------------------------------

def test_seedbench_2_prompt_and_case_sensitivity():
    t = get_task("seedbench_2")
    doc = {"question": "Which?", "choice_a": "cat", "choice_b": "x.jpg",
           "choice_c": "dog", "choice_d": "fox", "answer": "A",
           "data_type": "Scene Understanding", "data_id": ["a"],
           "question_id": 1, "image": []}
    txt = t.doc_to_text(doc)
    # image-path choices render as the image token
    assert "B. <image>" in txt and "A. cat" in txt
    # Image Generation docs prepend len(data_id)-4 tokens... only when
    # positive; 1-4 => none
    gen = dict(doc, data_type="Image Generation",
               data_id=["a", "b", "c", "d", "e", "f"])
    assert t.doc_to_text(gen).startswith("<image> <image>\n")
    r = t.process_results(doc, "A. cat")
    assert r["pred"] == "A"
    # v2 scoring is case-SENSITIVE: "a" != "A"
    r_low = t.process_results(doc, "a")
    agg = t.aggregate([r, r_low])
    assert agg["seed_all"] == 0.5
    assert agg["seed_Scene_Understanding"] == 0.5

    tp = get_task("seedbench_2_plus")
    docp = {"question": "Which?", "choice_A": "cat", "choice_B": "dog",
            "choice_C": "fox", "choice_D": "owl", "answer": "A",
            "question_image_type": "chart", "question_id": 2,
            "image": None}
    rp = tp.process_results(docp, "a")  # 2-plus lowercases
    aggp = tp.aggregate([rp])
    assert aggp["seedbench_2_plus_all"] == 1.0
    assert aggp["seedbench_2_plus_Chart"] == 1.0


# ---------------------------------------------------------------------------
# MMT + Vibe-Eval
# ---------------------------------------------------------------------------

def test_mmt_parser_and_rollups():
    from videoitg_tpu.eval.tasks.mmt import parse_multi_choice_response

    assert parse_multi_choice_response("(B)", ["A", "B", "C"]) == "B"
    assert parse_multi_choice_response("I pick C", ["A", "B", "C"]) == "C"
    assert parse_multi_choice_response("A. because", ["A", "B"]) == "A"
    # multi-candidate: LAST occurrence wins
    assert parse_multi_choice_response("A no wait B final",
                                       ["A", "B"]) == "B"
    t = get_task("mmt_val")
    doc = {"index": 1, "question": "What?", "A": "cat", "B": "dog",
           "C": "", "answer": "A", "l2-category": "visual_recognition",
           "split": "VAL", "image": []}
    txt = t.doc_to_text(doc)
    assert txt.startswith("Question: <image>\n")
    assert "A: cat\nB: dog" in txt and "C:" not in txt
    assert txt.endswith("single character from the given options.")
    r = t.process_results(doc, "A")
    r2 = t.process_results(dict(doc, index=2, answer="B",
                                **{"l2-category": "counting"}), "A")
    agg = t.aggregate([r, r2])
    assert agg["mmt_accuracy"] == 50.0
    assert agg["mmt_visual_recognition"] == 100.0
    assert agg["mmt_counting"] == 0.0
    for n in ("mmt_test", "mmt_mi_val", "mmt_mi_test"):
        assert get_task(n) is not None


def test_vibe_eval_rating_standin():
    t = get_task("vibe_eval")
    doc = {"example_id": "e1", "category": "difficulty-hard",
           "prompt": "Describe the image.",
           "reference": "A small red fox jumps over the sleeping dog.",
           "image": None, "media_url": ""}
    # echoing the reference -> top rating 5 -> 100
    r = t.process_results(doc, "A small red fox jumps over the sleeping dog.")
    assert r["score"] == 5
    r2 = t.process_results(dict(doc, example_id="e2",
                                category="difficulty-normal"),
                           "completely unrelated words entirely here")
    assert r2["score"] == 1
    agg = t.aggregate([r, r2])
    assert agg["vibe_eval_all"] == pytest.approx((100 + 0) / 2)
    assert agg["vibe_eval_hard"] == 100.0
    assert agg["vibe_eval_normal"] == 0.0

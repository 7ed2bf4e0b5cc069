"""Conversation template preprocessing tests."""

from videoitg_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from videoitg_tpu.data.conversation import (
    preprocess_chatml,
    preprocess_plain,
    split_around_image,
)


class Tok:
    """Char tokenizer with fake ChatML specials."""

    bos_token_id = None
    additional_special_tokens_ids = [400, 401]  # im_start, im_end

    def __call__(self, text):
        r = type("R", (), {})()
        r.input_ids = [ord(c) % 256 for c in text]
        return r


def test_preprocess_plain():
    convs = [
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "hi"},
    ]
    ids, labels = preprocess_plain(convs, Tok())
    assert ids[0] == IMAGE_TOKEN_INDEX
    assert labels[0] == IGNORE_INDEX
    assert ids[1:] == [ord("h"), ord("i"), ord("\n")]
    assert labels[1:] == ids[1:]


def test_preprocess_chatml_masks_user_supervises_assistant():
    tok = Tok()
    convs = [
        {"from": "human", "value": "<image>\nwhat?"},
        {"from": "gpt", "value": "ans"},
        {"from": "human", "value": "more?"},
        {"from": "gpt", "value": "yes"},
    ]
    ids, labels = preprocess_chatml(convs, tok)
    assert len(ids) == len(labels)
    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    # image token masked
    assert labels[ids.index(IMAGE_TOKEN_INDEX)] == IGNORE_INDEX
    # assistant content ids appear supervised
    a_ids = [ord(c) for c in "ans"]
    found = any(
        labels[i:i + 3] == a_ids and ids[i:i + 3] == a_ids
        for i in range(len(ids) - 2)
    )
    assert found
    # system content masked (except structural unmask tokens)
    s_ids = [ord(c) % 256 for c in "You are"]
    for i in range(len(ids) - len(s_ids)):
        if ids[i:i + len(s_ids)] == s_ids:
            assert all(
                l == IGNORE_INDEX or ids[j] in (400, 401, ord("\n"))
                for j, l in enumerate(labels[i:i + len(s_ids)], start=i)
            )
            break
    # im_start/im_end unmasked
    assert all(labels[i] == 400 for i, t in enumerate(ids) if t == 400)


def test_split_around_image():
    ids = [1, 2, IMAGE_TOKEN_INDEX, 3, 4, 5]
    labels = [IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX, 3, 4, 5]
    packed = split_around_image(ids, labels)
    assert packed.pre_ids == [1, 2]
    assert packed.post_ids == [3, 4, 5]
    assert packed.post_labels == [3, 4, 5]

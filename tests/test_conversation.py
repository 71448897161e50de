"""Conversation template tests."""

from qserve_tpu.conversation import (
    get_conv_template,
    get_conv_template_name,
)


class TestTemplates:
    def test_llama3_format(self):
        c = get_conv_template("llama-3")
        c.append_message(c.roles[0], "Hi")
        c.append_message(c.roles[1], None)
        p = c.get_prompt()
        assert p.startswith("<|begin_of_text|><|start_header_id|>system")
        assert "<|start_header_id|>user<|end_header_id|>\n\nHi<|eot_id|>" in p
        assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")

    def test_vicuna_format(self):
        c = get_conv_template("vicuna_v1.1")
        c.append_message(c.roles[0], "Hello")
        c.append_message(c.roles[1], "Hi there")
        c.append_message(c.roles[0], "Bye")
        c.append_message(c.roles[1], None)
        p = c.get_prompt()
        assert "USER: Hello ASSISTANT: Hi there</s>USER: Bye ASSISTANT:" in p

    def test_multi_turn_state(self):
        c = get_conv_template("chatml")
        c.append_message(c.roles[0], "a")
        c.append_message(c.roles[1], None)
        c.update_last_message("b")
        p = c.get_prompt()
        assert "<|im_start|>assistant\nb<|im_end|>" in p

    def test_copy_isolation(self):
        c1 = get_conv_template("llama-2")
        c1.append_message(c1.roles[0], "x")
        c2 = get_conv_template("llama-2")
        assert not c2.messages

    def test_name_mapping(self):
        assert get_conv_template_name("/m/Llama-3-8B-Instruct") == "llama-3"
        assert get_conv_template_name("/m/Llama-2-7b-chat") == "llama-2"
        assert get_conv_template_name("/m/vicuna-7b-v1.5") == "vicuna_v1.1"
        assert get_conv_template_name("/m/Qwen1.5-72B-Chat") == "chatml"
        assert get_conv_template_name("/m/VILA1.5-13b") == "vila_v1"
        assert get_conv_template_name("/m/Mistral-7B-Instruct") == "mistral"
        assert get_conv_template_name("/m/gpt2") == "plain"

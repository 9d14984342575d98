"""Screen-navigation GUI agent on the TPU framework.

Role parity: reference computer_use/gui_agent.py — screenshot -> VLM
(action-space system prompt + task + past actions) -> parsed action ->
pyautogui execution, with point-annotated screenshot history.

TPU notes: inference rides mlx_vlm_tpu.load/generate; screenshot capture
(PIL.ImageGrab) and input synthesis (pyautogui) are host-side and lazily
imported so the planning loop (build_messages -> generate ->
parse/validate/scale) is usable headless — `--dry-run` prints the planned
action instead of executing it, which is also how the tests drive it.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Any, Dict, List, Optional

from action_parser import parse_action_response, scale_position, \
    validate_action  # noqa: local script import (reference layout)

MIN_PIXELS = 256 * 28 * 28
MAX_PIXELS = 1512 * 982

_NAV_SYSTEM = """You are an assistant trained to navigate the {app} screen.
Given a task instruction, a screen observation, and an action history sequence,
output the next action and wait for the next observation.
Here is the action space:
{action_space}
"""

ACTION_SPACE = """
1. `CLICK`: Click on an element, value is not applicable and the position [x,y] is required.
2. `INPUT`: Type a string into an element, value is a string to type and the position [x,y] is required.
3. `SELECT`: Select a value for an element, value is not applicable and the position [x,y] is required.
4. `HOVER`: Hover on an element, value is not applicable and the position [x,y] is required.
5. `ANSWER`: Answer the question, value is the answer and the position is not applicable.
6. `ENTER`: Enter operation, value and position are not applicable.
7. `SCROLL`: Scroll the screen, value is the direction to scroll and the position is not applicable.
8. `SELECT_TEXT`: Select some text content, value is not applicable and position [[x1,y1], [x2,y2]] is the start and end position of the select operation.
9. `COPY`: Copy the text, value is the text to copy and the position is not applicable.
"""

_NAV_FORMAT = """
Format the action as a dictionary with the following keys:
{'action': 'ACTION_TYPE', 'value': 'element', 'position': [x,y]}

If value or position is not applicable, set it as `None`.
Position might be [[x1,y1], [x2,y2]] if the action requires a start and end position.
Position represents the relative coordinates on the screenshot and should be scaled to a range of 0-1.
"""


def system_prompt(app: str = "computer") -> str:
    return _NAV_SYSTEM.format(app=app, action_space=ACTION_SPACE) + _NAV_FORMAT


def build_prompt(task: str, past_actions: List[Dict[str, Any]],
                 app: str = "computer") -> str:
    """Planning prompt text for one step (image rides separately)."""
    return (f"{system_prompt(app)}\nTask: {task}\n"
            f"Past actions: {json.dumps(past_actions)}")


# ------------------------------------------------------------- execution
def execute_action(action: Dict[str, Any]) -> Optional[str]:
    """Drive the host UI (lazy pyautogui/pyperclip; reference
    action_functions table).  Returns the ANSWER text when applicable."""
    name = action["action"]
    pos = action.get("position")
    value = action.get("value")
    if name == "ANSWER":
        return str(value)
    import pyautogui  # noqa: host-control dependency, lazy

    if name == "CLICK":
        pyautogui.click(x=pos[0], y=pos[1], interval=0.2, clicks=2,
                        button="left")
    elif name == "INPUT":
        pyautogui.click(x=pos[0], y=pos[1], interval=0.2, clicks=2)
        pyautogui.typewrite(str(value), interval=0.05)
    elif name in ("SELECT", "HOVER"):
        pyautogui.moveTo(x=pos[0], y=pos[1])
        if name == "SELECT":
            pyautogui.click(x=pos[0], y=pos[1])
    elif name == "ENTER":
        pyautogui.press("enter")
    elif name == "SCROLL":
        pyautogui.scroll(20 if str(value).lower() == "down" else -20)
    elif name == "SELECT_TEXT":
        (x1, y1), (x2, y2) = pos
        pyautogui.moveTo(x=x1, y=y1)
        pyautogui.mouseDown()
        pyautogui.moveTo(x=x2, y=y2)
        pyautogui.mouseUp()
    elif name == "COPY":
        import pyperclip

        pyperclip.copy(str(value))
    return None


def plan_step(model, processor, task: str,
              past_actions: List[Dict[str, Any]], screenshot,
              temperature: float = 0.1, max_tokens: int = 1000
              ) -> Dict[str, Any]:
    """One planning round: prompt the VLM with the screenshot, parse and
    validate the action, scale positions to pixels."""
    from mlx_vlm_tpu import apply_chat_template, generate

    prompt = apply_chat_template(
        processor, getattr(model, "config_dict", {}),
        build_prompt(task, past_actions), num_images=1)
    result = generate(model, processor, prompt, image=screenshot,
                      temperature=temperature, max_tokens=max_tokens,
                      verbose=False)
    text = result.text if hasattr(result, "text") else str(result)
    action = validate_action(parse_action_response(text))
    return scale_position(action, screenshot.width, screenshot.height)


def navigation_history_append(query: str, action: Dict[str, Any],
                              filepath: str,
                              csv_path: str = "navigation_history.csv"):
    """Append one row to the CSV history (reference utils.py, stdlib csv
    instead of pandas)."""
    import csv

    exists = os.path.exists(csv_path)
    with open(csv_path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["Query", "Response", "Screenshot Path"])
        w.writerow([query, json.dumps(action), filepath])


def main():
    parser = argparse.ArgumentParser("mlx_vlm_tpu GUI agent")
    parser.add_argument("--model", required=True)
    parser.add_argument("--task", default=None,
                        help="one-shot task (otherwise interactive)")
    parser.add_argument("--dry-run", action="store_true",
                        help="plan only; print the action, do not execute")
    parser.add_argument("--max-steps", type=int, default=1)
    args = parser.parse_args()

    from PIL import ImageGrab

    from mlx_vlm_tpu import load

    model, processor = load(args.model)
    past: List[Dict[str, Any]] = []
    while True:
        task = args.task or input("What would you like me to do? ")
        if task.lower() == "exit":
            break
        for _ in range(args.max_steps):
            shot = ImageGrab.grab()
            action = plan_step(model, processor, task, past, shot)
            print(f"action: {json.dumps(action)}")
            if not args.dry_run:
                answer = execute_action(action)
                if answer is not None:
                    print(f"answer: {answer}")
                os.makedirs("screenshots", exist_ok=True)
                fp = os.path.join(
                    "screenshots",
                    f"screenshot_{time.strftime('%Y%m%d-%H%M%S')}.png")
                shot.save(fp)
                navigation_history_append(task, action, fp)
            past.append(action)
            if action["action"] == "ANSWER":
                break
        if args.task:
            break


if __name__ == "__main__":
    main()

"""In-browser smoke test of the HTML player (reference interactive loop:
html/index.js:445-737).

Drives html/index.html in a real headless browser: loads the first sample
puzzle, keys through its known solution, asserts the solved overlay appears,
and exercises undo/reset.  SKIPPED when no browser automation stack exists
— this image ships neither a browser binary (chromium/chrome/firefox), nor
a JS runtime (node/quickjs), nor selenium/playwright (verified 2026-08-20),
so the player's JS is covered here by static structural tests
(tests/test_html_player.py) plus the sample-puzzle solvability checks that
share its dynamics tables.
"""

import os
import shutil

import pytest

HTML = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "html", "index.html")


def _find_browser():
    for name in ("chromium", "chromium-browser", "google-chrome", "chrome"):
        path = shutil.which(name)
        if path:
            return path
    return None


def _selenium_driver(browser_path):
    try:
        from selenium import webdriver
        from selenium.webdriver.chrome.options import Options
    except ImportError:
        return None
    opts = Options()
    opts.binary_location = browser_path
    opts.add_argument("--headless=new")
    opts.add_argument("--no-sandbox")
    opts.add_argument("--disable-dev-shm-usage")
    try:
        return webdriver.Chrome(options=opts)
    except Exception:
        return None


browser = _find_browser()
pytestmark = pytest.mark.skipif(
    browser is None, reason="no browser binary in image"
)


@pytest.fixture
def driver():
    drv = _selenium_driver(browser)
    if drv is None:
        pytest.skip("selenium chromedriver unavailable")
    yield drv
    drv.quit()


def test_player_loads_and_solves_first_sample(driver):
    from selenium.webdriver.common.by import By
    from selenium.webdriver.common.keys import Keys

    driver.get("file://" + HTML)
    samples = driver.find_element(By.ID, "samples")
    assert len(samples.find_elements(By.TAG_NAME, "option")) > 0

    # The first sample auto-loads; its solution is embedded for the demo.
    solution = driver.execute_script(
        "return SAMPLE_PUZZLES[document.getElementById('samples').value]"
        ".solution || ''"
    )
    assert solution, "first sample must embed a solution"
    body = driver.find_element(By.TAG_NAME, "body")
    keymap = {"L": Keys.ARROW_LEFT, "R": Keys.ARROW_RIGHT,
              "U": Keys.ARROW_UP, "D": Keys.ARROW_DOWN}
    for ch in solution:
        body.send_keys(keymap[ch])
    status = driver.find_element(By.ID, "status").text
    assert "solved" in status.lower()

    # Reset clears the solved state.
    driver.find_element(By.ID, "reset").click()
    status = driver.find_element(By.ID, "status").text
    assert "solved" not in status.lower()

    # One move + undo returns to the initial state.
    body.send_keys(keymap[solution[0]])
    driver.find_element(By.ID, "undo").click()
    state0 = driver.execute_script(
        "return JSON.stringify(pushworldPlayer.state)"
    )
    init = driver.execute_script(
        "return JSON.stringify("
        "pushworldPlayer.puzzle.movables.map(m => m.start))"
    )
    assert state0 == init

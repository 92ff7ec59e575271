/**
 * PushWorld interactive player.
 *
 * A standalone vanilla-JS implementation of the PushWorld puzzle semantics
 * (reference behavior: html/index.js in google-deepmind/pushworld — .pwp
 * parsing, push-propagation dynamics with transitive stopping, arrow-key
 * play with undo/reset and a solved overlay).  Re-designed from scratch:
 * no frameworks, puzzles load from file pickers / drag-drop / textarea, and
 * the dynamics mirror pushworld_tpu.core.puzzle exactly.
 */
"use strict";

const COLORS = {
  agent: "#00DC00",
  agentBorder: "#006E00",
  agentWall: "#FAC71E",
  agentWallBorder: "#7D640F",
  goalBorder: "#B90000",
  goalObject: "#DC0000",
  goalObjectBorder: "#6E0000",
  movable: "#469BFF",
  movableBorder: "#23487F",
  wall: "#0A0A0A",
  wallBorder: "#050505",
  background: "#FFFFFF",
};

const DISPLACEMENTS = {
  ArrowLeft: [-1, 0],
  ArrowRight: [1, 0],
  ArrowUp: [0, -1],
  ArrowDown: [0, 1],
};

/** Parses .pwp text into a puzzle model. Throws on malformed input. */
function parsePuzzle(text) {
  const cells = new Map(); // id -> array of [x, y]
  let width = 0;
  let y = 0;
  for (const rawLine of text.split(/\r?\n/)) {
    const tokens = rawLine.trim().split(/\s+/).filter((t) => t.length);
    if (!tokens.length) continue;
    y += 1;
    if (y === 1) width = tokens.length;
    else if (tokens.length !== width) {
      throw new Error(`Row ${y} does not match the first row's width.`);
    }
    tokens.forEach((token, i) => {
      for (const raw of token.split("+")) {
        const id = raw.toLowerCase();
        if (id === ".") continue;
        if (!cells.has(id)) cells.set(id, []);
        cells.get(id).push([i + 1, y]);
      }
    });
  }
  if (!cells.has("a")) throw new Error("Puzzle must contain an agent ('A').");
  const W = width + 2;
  const H = y + 2;

  const walls = new Set();
  for (const [x, yy] of cells.get("w") || []) walls.add(x + "," + yy);
  for (let x = 0; x < W; x++) { walls.add(x + ",0"); walls.add(x + "," + (H - 1)); }
  for (let yy = 0; yy < H; yy++) { walls.add("0," + yy); walls.add((W - 1) + "," + yy); }
  const agentWalls = new Set();
  for (const [x, yy] of cells.get("aw") || []) agentWalls.add(x + "," + yy);

  // Movables: agent, goal movables (ascending goal id), remaining (ascending).
  const goalIds = [...cells.keys()].filter((k) => k[0] === "g" && k !== "g").sort();
  const names = ["a"];
  for (const g of goalIds) {
    const m = "m" + g.slice(1);
    if (!cells.has(m)) throw new Error(`Goal has no associated movable: ${m}`);
    names.push(m);
  }
  for (const k of [...cells.keys()].sort()) {
    if (k[0] === "m" && k !== "m" && !names.includes(k)) names.push(k);
  }

  const origin = (pts) => [
    Math.min(...pts.map((p) => p[0])),
    Math.min(...pts.map((p) => p[1])),
  ];
  const movables = names.map((id) => {
    const pts = cells.get(id);
    const [ox, oy] = origin(pts);
    return {
      id,
      cells: pts.map(([x, yy]) => [x - ox, yy - oy]),
      start: [ox, oy],
    };
  });
  const goals = goalIds.map((id) => {
    const pts = cells.get(id);
    const [ox, oy] = origin(pts);
    return { id, cells: pts.map(([x, yy]) => [x - ox, yy - oy]), pos: [ox, oy] };
  });
  return { W, H, walls, agentWalls, movables, goals, numGoals: goals.length };
}

const key = (x, y) => x + "," + y;

function absCells(movable, pos) {
  return movable.cells.map(([cx, cy]) => [pos[0] + cx, pos[1] + cy]);
}

/** The exact transition: returns the next state (array of [x, y]), or the
 * same array reference if nothing moves. */
function nextState(puzzle, state, d) {
  const [dx, dy] = d;
  const occupancy = puzzle.movables.map((m, i) => {
    const s = new Set();
    for (const [x, y] of absCells(m, state[i])) s.add(key(x, y));
    return s;
  });

  // Agent blocked by walls or agent-walls?
  for (const [x, y] of absCells(puzzle.movables[0], state[0])) {
    const k = key(x + dx, y + dy);
    if (puzzle.walls.has(k) || puzzle.agentWalls.has(k)) return state;
  }

  const pushed = new Array(state.length).fill(false);
  pushed[0] = true;
  const frontier = [0];
  while (frontier.length) {
    const i = frontier.pop();
    const targets = absCells(puzzle.movables[i], state[i]).map(
      ([x, y]) => key(x + dx, y + dy)
    );
    for (let j = 1; j < state.length; j++) {
      if (pushed[j]) continue;
      if (targets.some((t) => occupancy[j].has(t))) {
        // Transitive stop: a pushed movable would hit a wall.
        for (const [x, y] of absCells(puzzle.movables[j], state[j])) {
          if (puzzle.walls.has(key(x + dx, y + dy))) return state;
        }
        pushed[j] = true;
        frontier.push(j);
      }
    }
  }
  return state.map(([x, y], i) => (pushed[i] ? [x + dx, y + dy] : [x, y]));
}

function isGoalState(puzzle, state) {
  return puzzle.goals.every(
    (g, k) => state[k + 1][0] === g.pos[0] && state[k + 1][1] === g.pos[1]
  );
}

// ------------------------------------------------------------------ drawing

function drawObject(ctx, cells, pos, cell, bw, fill, border) {
  const inSet = new Set(cells.map(([x, y]) => key(x, y)));
  for (const [cx, cy] of cells) {
    const px = (pos[0] + cx) * cell;
    const py = (pos[1] + cy) * cell;
    if (fill) {
      ctx.fillStyle = fill;
      ctx.fillRect(px, py, cell, cell);
    }
    ctx.fillStyle = border;
    const edges = [
      [-1, 0], [1, 0], [0, -1], [0, 1],
      [-1, -1], [-1, 1], [1, -1], [1, 1],
    ];
    for (const [ex, ey] of edges) {
      if (inSet.has(key(cx + ex, cy + ey))) continue;
      const x1 = px + (ex > 0 ? cell - bw : 0);
      const w = ex === 0 ? cell : bw;
      const y1 = py + (ey > 0 ? cell - bw : 0);
      const h = ey === 0 ? cell : bw;
      ctx.fillRect(x1, y1, w, h);
    }
  }
}

class Player {
  constructor(canvas, statusEl) {
    this.canvas = canvas;
    this.statusEl = statusEl;
    this.puzzle = null;
    this.state = null;
    this.history = [];
    this.moves = 0;
  }

  load(text) {
    this.puzzle = parsePuzzle(text);
    this.reset();
  }

  reset() {
    this.state = this.puzzle.movables.map((m) => [...m.start]);
    this.history = [];
    this.moves = 0;
    this.draw();
  }

  undo() {
    if (this.history.length) {
      this.state = this.history.pop();
      this.moves -= 1;
      this.draw();
    }
  }

  move(keyName) {
    const d = DISPLACEMENTS[keyName];
    if (!d || !this.puzzle) return;
    if (isGoalState(this.puzzle, this.state)) return;
    const next = nextState(this.puzzle, this.state, d);
    if (next !== this.state) {
      this.history.push(this.state);
      this.state = next;
      this.moves += 1;
    }
    this.draw();
  }

  draw() {
    const p = this.puzzle;
    if (!p) return;
    const cell = Math.max(
      8,
      Math.floor(Math.min(640 / p.W, 640 / p.H))
    );
    const bw = Math.max(1, Math.floor(cell / 10));
    this.canvas.width = p.W * cell;
    this.canvas.height = p.H * cell;
    const ctx = this.canvas.getContext("2d");
    ctx.fillStyle = COLORS.background;
    ctx.fillRect(0, 0, this.canvas.width, this.canvas.height);

    const wallCells = [...p.walls].map((s) => s.split(",").map(Number));
    const awCells = [...p.agentWalls].map((s) => s.split(",").map(Number));
    if (awCells.length) {
      drawObject(ctx, awCells, [0, 0], cell, bw, COLORS.agentWall, COLORS.agentWallBorder);
    }
    drawObject(ctx, wallCells, [0, 0], cell, bw, COLORS.wall, COLORS.wallBorder);
    p.movables.forEach((m, i) => {
      const fill = i === 0 ? COLORS.agent : i <= p.numGoals ? COLORS.goalObject : COLORS.movable;
      const border = i === 0 ? COLORS.agentBorder : i <= p.numGoals ? COLORS.goalObjectBorder : COLORS.movableBorder;
      drawObject(ctx, m.cells, this.state[i], cell, bw, fill, border);
    });
    for (const g of p.goals) {
      drawObject(ctx, g.cells, g.pos, cell, bw, null, COLORS.goalBorder);
    }

    const solved = isGoalState(this.puzzle, this.state);
    this.statusEl.textContent = solved
      ? `Solved in ${this.moves} moves!`
      : `Moves: ${this.moves}`;
    if (solved) {
      ctx.fillStyle = "rgba(0, 0, 0, 0.45)";
      ctx.fillRect(0, 0, this.canvas.width, this.canvas.height);
      ctx.fillStyle = "#FFFFFF";
      ctx.font = `bold ${Math.floor(cell * 1.2)}px sans-serif`;
      ctx.textAlign = "center";
      ctx.fillText("Solved!", this.canvas.width / 2, this.canvas.height / 2);
    }
  }
}

// ------------------------------------------------------------------ wiring

window.addEventListener("DOMContentLoaded", () => {
  const canvas = document.getElementById("board");
  const status = document.getElementById("status");
  const player = new Player(canvas, status);
  window.pushworldPlayer = player;

  const samples = document.getElementById("samples");
  if (typeof SAMPLE_PUZZLES !== "undefined") {
    for (const name of Object.keys(SAMPLE_PUZZLES)) {
      const opt = document.createElement("option");
      opt.value = name;
      opt.textContent = name;
      samples.appendChild(opt);
    }
    samples.addEventListener("change", () => {
      if (samples.value) player.load(SAMPLE_PUZZLES[samples.value].pwp);
    });
    const first = Object.keys(SAMPLE_PUZZLES)[0];
    if (first) { samples.value = first; player.load(SAMPLE_PUZZLES[first].pwp); }
  }

  document.getElementById("file").addEventListener("change", (e) => {
    const f = e.target.files[0];
    if (!f) return;
    f.text().then((t) => {
      try { player.load(t); } catch (err) { status.textContent = String(err); }
    });
  });
  document.getElementById("load-text").addEventListener("click", () => {
    try {
      player.load(document.getElementById("pwp-text").value);
    } catch (err) { status.textContent = String(err); }
  });
  document.getElementById("reset").addEventListener("click", () => player.reset());
  document.getElementById("undo").addEventListener("click", () => player.undo());

  window.addEventListener("keydown", (e) => {
    if (e.key in DISPLACEMENTS) {
      e.preventDefault();
      player.move(e.key);
    } else if (e.key === "z" || e.key === "u") player.undo();
    else if (e.key === "r") player.reset();
  });

  document.body.addEventListener("dragover", (e) => e.preventDefault());
  document.body.addEventListener("drop", (e) => {
    e.preventDefault();
    const f = e.dataTransfer.files[0];
    if (f) f.text().then((t) => {
      try { player.load(t); } catch (err) { status.textContent = String(err); }
    });
  });
});

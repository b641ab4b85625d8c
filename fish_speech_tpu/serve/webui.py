"""Self-contained web UI served at /ui (mirrors the reference's SPA mount,
tools/server/views.py:54-72 — here a single dependency-free HTML page that
drives the same /v1 API)."""

WEBUI_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>fish-speech-tpu</title>
<meta name="viewport" content="width=device-width, initial-scale=1">
<style>
  :root { color-scheme: dark; }
  body { font-family: system-ui, sans-serif; max-width: 760px; margin: 2rem auto;
         padding: 0 1rem; background: #101418; color: #e6e6e6; }
  h1 { font-size: 1.3rem; } h1 span { color: #6cf; }
  textarea { width: 100%; min-height: 7rem; background: #181e24; color: #eee;
             border: 1px solid #2a323a; border-radius: 8px; padding: .7rem; }
  .row { display: flex; gap: 1rem; flex-wrap: wrap; margin: .8rem 0; }
  .row label { display: flex; flex-direction: column; font-size: .8rem;
               color: #9ab; gap: .2rem; }
  input, select { background: #181e24; color: #eee; border: 1px solid #2a323a;
                  border-radius: 6px; padding: .35rem .5rem; width: 7rem; }
  button { background: #2563eb; color: white; border: 0; padding: .6rem 1.4rem;
           border-radius: 8px; font-size: 1rem; cursor: pointer; }
  button:disabled { opacity: .5; }
  #status { margin-left: 1rem; color: #9ab; }
  audio { width: 100%; margin-top: 1rem; }
</style>
</head>
<body>
<h1>fish-speech-<span>tpu</span></h1>
<textarea id="text" placeholder="Text to speak…"><|speaker:0|>Hello from the TPU.</textarea>
<div class="row">
  <label>chunk length <input id="chunk" type="number" value="200" min="100" max="1000"></label>
  <label>max new tokens <input id="maxnew" type="number" value="1024"></label>
  <label>top-p <input id="topp" type="number" value="0.8" step="0.05" min="0.1" max="1.0"></label>
  <label>temperature <input id="temp" type="number" value="0.8" step="0.05" min="0.1" max="1.0"></label>
  <label>seed <input id="seed" type="number" value="42"></label>
  <label>reference <select id="ref"><option value="">none</option></select></label>
</div>
<button id="go">Synthesize</button><span id="status"></span>
<audio id="player" controls></audio>
<script>
async function loadRefs() {
  try {
    const r = await fetch('/v1/references/list');
    const data = await r.json();
    const sel = document.getElementById('ref');
    for (const id of data.reference_ids || []) {
      const o = document.createElement('option');
      o.value = id; o.textContent = id; sel.appendChild(o);
    }
  } catch (e) {}
}
loadRefs();
document.getElementById('go').onclick = async () => {
  const btn = document.getElementById('go'), st = document.getElementById('status');
  btn.disabled = true; st.textContent = 'generating…';
  const t0 = performance.now();
  const body = {
    text: document.getElementById('text').value,
    chunk_length: +document.getElementById('chunk').value,
    max_new_tokens: +document.getElementById('maxnew').value,
    top_p: +document.getElementById('topp').value,
    temperature: +document.getElementById('temp').value,
    seed: +document.getElementById('seed').value,
    format: 'wav',
  };
  const ref = document.getElementById('ref').value;
  if (ref) body.reference_id = ref;
  try {
    const r = await fetch('/v1/tts', { method: 'POST',
      headers: {'Content-Type': 'application/json'}, body: JSON.stringify(body)});
    if (!r.ok) throw new Error(await r.text());
    const blob = await r.blob();
    const p = document.getElementById('player');
    p.src = URL.createObjectURL(blob);
    p.play();
    st.textContent = `done in ${((performance.now()-t0)/1000).toFixed(2)}s`;
  } catch (e) {
    st.textContent = 'error: ' + e.message.slice(0, 200);
  } finally { btn.disabled = false; }
};
</script>
</body>
</html>
"""

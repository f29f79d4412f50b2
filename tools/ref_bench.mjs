import schisma from '/root/reference/src/schisma.mjs'

// the same rule set as the engine's verdicts_lineitem benchmark query
const sch = schisma({
  l_quantity: { $type: Number, $validate: v => v <= 30 ? undefined : {expected: '<=30'} },
  l_discount: { $type: Number, $validate: v => v <= 0.05 ? undefined : {expected: '<=0.05'} },
  l_extendedprice: { $type: Number, $validate: v => v > 0 ? undefined : {expected: '>0'} },
})

const N = 1000000
const rows = new Array(N)
for (let i = 0; i < N; i++) {
  rows[i] = {
    l_quantity: (i % 50) + 1,
    l_discount: (i % 11) / 100,
    l_extendedprice: 900 + (i % 100000),
  }
}
// warm-up
for (let i = 0; i < 50000; i++) sch.validate(rows[i])
let t0 = process.hrtime.bigint()
let nViol = 0
for (let i = 0; i < N; i++) nViol += sch.validate(rows[i]).length
let dt = Number(process.hrtime.bigint() - t0) / 1e9
console.log(JSON.stringify({rows: N, violations: nViol, wall_sec: +dt.toFixed(3), rows_per_sec: Math.round(N/dt)}))

// image-table-style rule set (matches images_schema_dsl shape)
const sch2 = schisma({
  image_id: { $type: String, $validate: v => /^img-/.test(v) ? undefined : 'bad id' },
  w: { $type: Number, $validate: v => v > 0 && v <= 4096 ? undefined : 'bad w' },
  h: { $type: Number, $validate: v => v > 0 && v <= 4096 ? undefined : 'bad h' },
  fmt: { $type: String, $validate: v => ['raw','bmp','png'].includes(v) ? undefined : 'bad fmt' },
  caption: String,
  phash: Number,
  part: Number,
})
const M = 500000
const imgs = new Array(M)
for (let i = 0; i < M; i++) {
  imgs[i] = {image_id: `img-${i}`, w: 32, h: 32, fmt: 'png', caption: 'a b c d e f', phash: i * 7919, part: i % 16}
}
for (let i = 0; i < 25000; i++) sch2.validate(imgs[i])
t0 = process.hrtime.bigint()
nViol = 0
for (let i = 0; i < M; i++) nViol += sch2.validate(imgs[i]).length
dt = Number(process.hrtime.bigint() - t0) / 1e9
console.log(JSON.stringify({image_rows: M, violations: nViol, wall_sec: +dt.toFixed(3), rows_per_sec: Math.round(M/dt)}))
